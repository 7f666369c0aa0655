"""log_images / gallery-row / ImageLogger tests on the tiny model."""

import os

import jax
import numpy as np
import pytest

from frido_tpu.models.frido import FridoDiffusion
from frido_tpu.training.image_logger import ImageLogger
from tests.test_training import TINY_COND, TINY_FIRST, TINY_UNET

# <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def tiny_model():
    model = FridoDiffusion(
        first_stage_config=TINY_FIRST, cond_stage_config=TINY_COND,
        unet_config=TINY_UNET, timesteps=20, loss_type="l1", image_size=16,
        channels=8, conditioning_key="crossattn", adopted_scale_factor=True,
        cond_stage_trainable=True)
    params = model.init_params(jax.random.PRNGKey(0), context_len=8)
    return model, params


def make_batch(n=2):
    rng = np.random.RandomState(0)
    return {
        "image": rng.randn(n, 32, 32, 3).astype(np.float32) * 0.3,
        "caption": [f"caption {i}" for i in range(n)],
        "tokens": rng.randint(0, 32, (n, 8)),
        "file_name": [f"img_{i}.jpg" for i in range(n)],
    }


def test_log_images_keys(tiny_model):
    model, params = tiny_model
    model.cond_stage_key = "tokens"  # raw-token cond for the tiny BERT
    logs = model.log_images(params, make_batch(), n=2, ddim_steps=4,
                            ddim_eta=0.0, sample_flag=True)
    for k in ["inputs", "reconstruction", "samples"]:
        assert k in logs and logs[k].shape[0] == 2, k
        assert np.isfinite(logs[k]).all()
    assert logs["samples"].shape == (2, 32, 32, 3)


def test_log_rows(tiny_model):
    model, params = tiny_model
    model.cond_stage_key = "tokens"
    logs = model.log_rows(params, make_batch(), n_row=2, ddim_steps=4,
                          log_every_t=10)
    assert "diffusion_row" in logs and "denoise_row" in logs
    assert logs["diffusion_row"].shape[0] == 2
    assert np.isfinite(logs["denoise_row"]).all()


def test_image_logger_writes(tiny_model, tmp_path):
    model, params = tiny_model
    model.cond_stage_key = "tokens"
    il = ImageLogger(str(tmp_path), every_steps=10, max_images=2)
    assert il.should_log(10) and not il.should_log(11)
    il.log_train(model, params, make_batch(), 10, sample=False)
    files = os.listdir(tmp_path / "images" / "train")
    assert any(f.startswith("inputs") for f in files)
    assert any(f.startswith("reconstruction") for f in files)

    logs = {"sample": np.zeros((2, 8, 8, 3), np.float32),
            "file_name": ["a.jpg", "b.jpg"]}
    il2 = ImageLogger(str(tmp_path), shard_idx=1)
    il2.log_test(logs, str(tmp_path / "test_out"))
    out = os.listdir(tmp_path / "test_out" / "img" / "sample")
    assert sorted(out) == ["a_r1.png", "b_r1.png"]


def test_log_images_plot_flags(tiny_model):
    """plot_* config gates (clip config: plot_sample False,
    plot_quantize_denoised True)."""
    model, params = tiny_model
    model.cond_stage_key = "tokens"
    batch = make_batch()
    model.extra["plot_sample"] = False
    try:
        log = model.log_images(params, batch, n=2, ddim_steps=2,
                               ddim_eta=0.0)
        assert "samples" not in log
        model.extra["plot_sample"] = True
        model.extra["plot_quantize_denoised"] = True
        log = model.log_images(params, batch, n=2, ddim_steps=2,
                               ddim_eta=0.0)
        assert "samples" in log and "samples_x0_quantized" in log
        assert log["samples_x0_quantized"].shape == log["samples"].shape
        assert np.isfinite(log["samples_x0_quantized"]).all()
    finally:
        model.extra.pop("plot_sample", None)
        model.extra.pop("plot_quantize_denoised", None)


def test_log_images_progressive_rows(tiny_model):
    """plot_progressive_rows: full-T vanilla chain x0 composites as a
    gallery (``frido.py:1576-1582``)."""
    model, params = tiny_model
    model.cond_stage_key = "tokens"
    model.extra["plot_progressive_rows"] = True
    try:
        log = model.log_images(params, make_batch(), n=2, ddim_steps=2,
                               ddim_eta=0.0)
        assert "progressive_row" in log
        assert log["progressive_row"].shape[0] == 2
        assert np.isfinite(log["progressive_row"]).all()
    finally:
        model.extra.pop("plot_progressive_rows", None)
