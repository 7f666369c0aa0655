#!/usr/bin/env python
"""Generate the shipped model configs from a parametric template.

Hyperparameters follow the published Frido (AAAI'23) model zoo — the four
conditional tasks (t2i/layout2i/sg2i/label2i) over the f16f8 / f8f4 MS-VQGAN
first stages — so that reference workflows and checkpoints run unmodified.
Run: python tools/gen_configs.py  (writes configs/**.yaml)
"""

from __future__ import annotations

import os

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------------------
# first stages
# ---------------------------------------------------------------------------

def first_stage(kind: str):
    if kind == "f16f8":
        return dict(
            target="taming.models.msvqgan.VQModelInterface",
            params=dict(
                ckpt_path="exp/msvqgan/openimage_f16f8/model.ckpt",
                embed_dim=[4, 4], n_embed=[8192, 8192],
                edconfig=dict(multiscale=2, double_z=False, z_channels=[4, 4],
                              resolution=256, in_channels=3, out_ch=3, ch=128,
                              ch_mult=[1, 1, 2, 2, 4], num_res_blocks=2,
                              attn_resolutions=[32], dropout=0.0),
                ddconfig=dict(double_z=False, z_channels=8, resolution=256,
                              in_channels=3, out_ch=3, ch=128,
                              ch_mult=[1, 1, 2, 4], num_res_blocks=2,
                              attn_resolutions=[32], dropout=0.0),
                lossconfig=dict(target="taming.modules.losses.DummyLoss")))
    if kind == "f8f4":
        return dict(
            target="taming.models.msvqgan.VQModelInterface",
            params=dict(
                ckpt_path="exp/msvqgan/openimage_f8f4/model.ckpt",
                embed_dim=[3, 3], n_embed=[4096, 4096],
                edconfig=dict(multiscale=2, double_z=False, z_channels=[3, 3],
                              resolution=256, in_channels=3, out_ch=3, ch=128,
                              ch_mult=[1, 1, 2, 4], num_res_blocks=2,
                              attn_resolutions=[64], dropout=0.0),
                ddconfig=dict(double_z=False, z_channels=6, resolution=256,
                              in_channels=3, out_ch=3, ch=128,
                              ch_mult=[1, 2, 4], num_res_blocks=2,
                              attn_resolutions=[64], dropout=0.0),
                lossconfig=dict(target="taming.modules.losses.DummyLoss")))
    raise ValueError(kind)


def unet(image_size, channels, split):
    return dict(
        target="frido.modules.diffusionmodules.pyunet.PyUNetModel",
        params=dict(use_split_head=True, split_embed_dim_list=list(split),
                    use_SPADE_norm=True, image_size=image_size,
                    in_channels=channels, out_channels=channels,
                    model_channels=192, attention_resolutions=[8, 4, 2],
                    num_res_blocks=2, channel_mult=[1, 2, 3, 5],
                    num_head_channels=32, use_spatial_transformer=True,
                    transformer_depth=1, context_dim=640, num_stage=2))


def bert(**kw):
    p = dict(n_embed=640, n_layer=32)
    p.update(kw)
    return dict(target="frido.modules.encoders.modules.BERTEmbedder", params=p)


def model(fs_kind, cond_stage_key, cond_cfg, image_size, channels, split,
          monitor="val/loss"):
    return dict(
        base_learning_rate=1.0e-06,
        target="frido.models.diffusion.frido.FridoDiffusion",
        params=dict(
            adopted_scale_factor=True, noise_mix_ratio=0.1,
            first_stage_key="image", cond_stage_key=cond_stage_key,
            linear_start=0.0015, linear_end=0.0155, num_timesteps_cond=1,
            log_every_t=200, timesteps=1000, loss_type="l1",
            image_size=image_size, channels=channels,
            cond_stage_trainable=True, conditioning_key="crossattn",
            scale_by_std=True, monitor=monitor,
            unet_config=unet(image_size, channels, split),
            first_stage_config=first_stage(fs_kind),
            cond_stage_config=cond_cfg,
            plot_sample=False, plot_inpaint=False, plot_denoise_rows=False,
            plot_progressive_rows=False, plot_diffusion_rows=False,
            plot_quantize_denoised=True))


def coco_ds(year, split, keys, caption=False, crop="center", flip=False,
            min_area=1e-05, min_obj=0, max_obj=90, **extra):
    p = dict(data_path=f"../datasets/coco/{year}",
             use_stuff=extra.pop("use_stuff", False), split=split,
             keys=list(keys), no_tokens=1024, target_image_size=256,
             min_object_area=min_area, min_objects_per_image=min_obj,
             max_objects_per_image=max_obj, crop_method=crop,
             random_flip=flip, use_group_parameter=True,
             encode_crop=extra.pop("encode_crop", False))
    if caption:
        p["caption_ann_path"] = (f"../datasets/coco/{year}/annotations/"
                                 + extra.pop("caption_file",
                                             f"captions_{'train' if split == 'train' else 'val'}{year}.json"))
    p.update(extra)
    return dict(target="taming.data.annotated_objects_coco.AnnotatedObjectsCoco",
                params=p)


def data(bs, train, validation, test):
    return dict(target="main.DataModuleFromConfig",
                params=dict(batch_size=bs, train=train,
                            validation=validation, test=test))


def write(path, cfg, header):
    full = os.path.join(REPO, "configs", path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w") as f:
        f.write(header)
        yaml.safe_dump(cfg, f, sort_keys=False)
    print("wrote", full)


def main():
    H = "# Generated by tools/gen_configs.py — published Frido hyperparameters.\n"
    eids = "frido_tpu/data/eval_ids"

    # ---------------- t2i (COCO 2014, captions) ----------------------
    t2i_keys = ["image", "caption", "file_name", "annotations"]
    t2i_test_keys = ["image", "objects", "caption", "file_name", "annotations"]
    t2i = dict(
        model=model("f16f8", "caption", bert(), 32, 8, [4, 4],
                    monitor="val/loss_ema"),
        data=data(
            32,
            coco_ds(2014, "train", t2i_keys, caption=True, crop="random-1d",
                    flip=True, min_obj=2, max_obj=30),
            coco_ds(2014, "validation", t2i_keys, caption=True),
            coco_ds(2014, "validation", t2i_test_keys, caption=True)),
        lightning=dict(trainer=dict(benchmark=True, max_epochs=1000)))
    write("frido/t2i/frido_f16f8_coco.yaml", t2i, H)

    t2i_mini = yaml.safe_load(yaml.safe_dump(t2i))
    t2i_mini["data"]["params"]["test"]["params"].update(
        img_id_file=f"{eids}/image_ids_t2i_coco_mini.txt", num_sample=1000)
    write("frido/t2i/frido_f16f8_coco_mini.yaml", t2i_mini, H)

    t2i_clip = yaml.safe_load(yaml.safe_dump(t2i))
    # frozen pooled CLIP text embedder, as the reference clip config
    t2i_clip["model"]["params"]["cond_stage_config"] = dict(
        target="frido.modules.encoders.modules.FrozenCLIPTextEmbedder")
    t2i_clip["model"]["params"]["cond_stage_trainable"] = False
    t2i_clip["model"]["params"]["unet_config"]["params"]["context_dim"] = 768
    write("frido/t2i/frido_f16f8_coco_clip.yaml", t2i_clip, H)

    # ---------------- sg2i (scene-graph captions) ---------------------
    sg_keys = ["image", "objects", "caption", "file_name", "annotations"]
    sg_coco = dict(
        model=model("f16f8", "caption", bert(max_seq_len=180), 32, 8, [4, 4]),
        data=data(
            24,
            coco_ds(2017, "train", sg_keys, caption=True, crop="random-1d",
                    flip=True, min_area=0.02, min_obj=3, max_obj=8,
                    use_stuff=True, caption_file="scenegraph_train2017.json"),
            coco_ds(2017, "validation", sg_keys, caption=True, min_area=0.02,
                    min_obj=3, max_obj=8, use_stuff=True,
                    caption_file="scenegraph_val2017.json"),
            coco_ds(2017, "validation", sg_keys, caption=True, min_area=0.02,
                    min_obj=3, max_obj=8, use_stuff=True,
                    caption_file="scenegraph_val2017.json",
                    img_id_file=f"{eids}/image_ids_sg2i_coco.txt")),
        lightning=dict(trainer=dict(benchmark=True, max_epochs=1000)))
    write("frido/sg2i/frido_f16f8_coco.yaml", sg_coco, H)

    vg_ds = lambda split, crop, flip: dict(
        target="taming.data.annotated_objects_vg.AnnotatedObjectsVg",
        params=dict(data_path="../datasets/vg",
                    caption_ann_path=f"../datasets/vg/{'train' if split == 'train' else 'val'}_sg.json",
                    use_stuff=False, split=split,
                    keys=["image", "caption", "file_name"], no_tokens=1024,
                    target_image_size=256, min_object_area=1e-05,
                    min_objects_per_image=0, max_objects_per_image=90,
                    crop_method=crop, random_flip=flip,
                    use_group_parameter=True, encode_crop=False))
    sg_vg = dict(
        model=model("f16f8", "caption", bert(max_seq_len=180), 32, 8, [4, 4]),
        data=data(24, vg_ds("train", "random-1d", True),
                  vg_ds("validation", "center", False),
                  vg_ds("validation", "center", False)),
        lightning=dict(trainer=dict(benchmark=True, max_epochs=1000)))
    write("frido/sg2i/frido_f16f8_vg.yaml", sg_vg, H)

    # ---------------- label2i (class tokens) --------------------------
    lb_keys = ["image", "objects", "file_name", "annotations"]
    lb_cond = bert(use_tokenizer=False, cond_key="objects")
    label2i = dict(
        model=model("f16f8", "objects", lb_cond, 32, 8, [4, 4]),
        data=data(
            2,
            coco_ds(2017, "train", lb_keys, crop="random-1d", flip=True,
                    min_area=0.0001, min_obj=2, max_obj=30),
            coco_ds(2017, "validation", lb_keys, min_area=0.0001, min_obj=2,
                    max_obj=30, crop="none"),
            coco_ds(2017, "validation", lb_keys, min_area=0.0001, min_obj=2,
                    max_obj=30, crop="none")),
        lightning=dict(trainer=dict(benchmark=True, max_epochs=1000)))
    write("frido/label2i/frido_f16f8_coco.yaml", label2i, H)

    lb_sg2im = yaml.safe_load(yaml.safe_dump(label2i))
    for s in ("train", "validation", "test"):
        lb_sg2im["data"]["params"][s]["params"].update(
            min_object_area=0.05, min_objects_per_image=3,
            max_objects_per_image=8, crop_method="center")
    lb_sg2im["data"]["params"]["batch_size"] = 32
    write("frido/label2i/frido_f16f8_coco_sg2im.yaml", lb_sg2im, H)

    # ---------------- layout2i (bbox tokens, f8f4) --------------------
    lo_keys = ["image", "objects_bbox", "file_name", "annotations"]
    lo_cond = bert(max_seq_len=96, use_tokenizer=False)
    lo_ds = lambda split, crop, flip, **kw: coco_ds(
        2017, split, lo_keys, crop=crop, flip=flip, min_area=0.02, min_obj=3,
        max_obj=8, encode_crop=True, OI_cate_path=f"{eids}/classes_coco.csv",
        **kw)
    layout_coco = dict(
        model=model("f8f4", "objects_bbox", lo_cond, 64, 6, [3, 3]),
        data=data(4, lo_ds("train", "random-1d", True),
                  lo_ds("validation", "center", False),
                  lo_ds("validation", "center", False,
                        img_id_file=f"{eids}/image_ids_layout2i_coco_2048.txt")),
        lightning=dict(trainer=dict(benchmark=True, max_epochs=1000)))
    write("frido/layout2i/frido_f8f4_coco_seg.yaml", layout_coco, H)

    layout_mini = yaml.safe_load(yaml.safe_dump(layout_coco))
    layout_mini["data"]["params"]["test"]["params"].update(
        img_id_file=f"{eids}/image_ids_layout2i_coco_mini.txt", num_sample=500)
    layout_mini["data"]["params"]["batch_size"] = 12
    write("frido/layout2i/frido_f8f4_coco_seg_mini.yaml", layout_mini, H)

    oi_ds = lambda split, crop, flip, **kw: dict(
        target="taming.data.annotated_objects_open_images.AnnotatedObjectsOpenImages",
        params=dict(use_additional_parameters=False,
                    data_path=f"../datasets/openimage/{'train' if split == 'train' else 'validation'}",
                    split=split, keys=["image", "objects_bbox", "file_name"],
                    no_tokens=8192, target_image_size=256,
                    min_object_area=1e-05, min_objects_per_image=2,
                    max_objects_per_image=30, crop_method=crop,
                    random_flip=flip, use_group_parameter=True,
                    encode_crop=True, **kw))
    layout_oi = dict(
        model=model("f8f4", "objects_bbox", lo_cond, 64, 6, [3, 3]),
        data=data(2, oi_ds("train", "random-1d", True),
                  oi_ds("validation", "center", False),
                  oi_ds("validation", "center", False,
                        img_id_file=f"{eids}/image_ids_layout2i_oi_2048.txt")),
        lightning=dict(trainer=dict(benchmark=True, max_epochs=1000)))
    write("frido/layout2i/frido_f8f4_openimage.yaml", layout_oi, H)

    vgc_ds = lambda split, crop, flip: dict(
        target="taming.data.annotated_objects_vg_cocostyle.AnnotatedObjectsVg",
        params=dict(data_path="../datasets/vg", use_stuff=False, split=split,
                    keys=lo_keys, no_tokens=1024, target_image_size=256,
                    min_object_area=0.02, min_objects_per_image=3,
                    max_objects_per_image=8, crop_method=crop,
                    random_flip=flip, use_group_parameter=True,
                    encode_crop=True))
    layout_vg = dict(
        model=model("f8f4", "objects_bbox", lo_cond, 64, 6, [3, 3]),
        data=data(4, vgc_ds("train", "random-1d", True),
                  vgc_ds("validation", "center", False),
                  vgc_ds("validation", "center", False)),
        lightning=dict(trainer=dict(benchmark=True, max_epochs=1000)))
    write("frido/layout2i/frido_f8f4_vg.yaml", layout_vg, H)

    # ---------------- msvqgan trainers --------------------------------
    def msvq_model(kind, lossparams):
        fs = first_stage(kind)["params"]
        fs.pop("ckpt_path")
        return dict(
            base_learning_rate=4.5e-06,
            target="taming.models.msvqgan.MSFPNVQModel",
            params=dict(monitor="val/rec_loss",
                        **{k: fs[k] for k in
                           ("embed_dim", "n_embed", "edconfig", "ddconfig")},
                        lossconfig=dict(
                            target="taming.modules.losses.vqperceptual."
                                   "VQLPIPSWithDiscriminator",
                            params=lossparams)))

    oi_img = lambda split, crop, flip: dict(
        target="taming.data.annotated_objects_open_images.AnnotatedObjectsOpenImages",
        params=dict(use_additional_parameters=False,
                    data_path=f"../datasets/openimage/{'train' if split == 'train' else 'validation'}",
                    split=split, keys=["image", "file_name"], no_tokens=1024,
                    target_image_size=256, min_object_area=1e-05,
                    min_objects_per_image=2, max_objects_per_image=30,
                    crop_method=crop, random_flip=flip,
                    use_group_parameter=True, encode_crop=True))
    loss_16 = dict(disc_conditional=False, disc_in_channels=3,
                   disc_num_layers=2, disc_start=30001, disc_weight=0.8,
                   codebook_weight=1.0)
    msvq_oi = dict(model=msvq_model("f16f8", loss_16),
                   data=data(6, oi_img("train", "random-1d", True),
                             oi_img("validation", "center", False),
                             oi_img("validation", "center", False)),
                   lightning=dict(trainer=dict(max_epochs=50)))
    write("msvqgan/msvqgan_f16f8_openimage.yaml", msvq_oi, H)

    coco_img = lambda split, crop, flip: coco_ds(
        2017, split, ["image", "file_name"], crop=crop, flip=flip,
        min_area=1e-05, min_obj=2, max_obj=30, encode_crop=True)
    msvq_coco = dict(model=msvq_model("f16f8", loss_16),
                     data=data(6, coco_img("train", "random-1d", True),
                               coco_img("validation", "center", False),
                               coco_img("validation", "center", False)),
                     lightning=dict(trainer=dict(max_epochs=50)))
    write("msvqgan/msvqgan_f16f8_coco.yaml", msvq_coco, H)

    # "same setting as LDM vq f4": default disc_num_layers (3)
    loss_84 = dict(disc_conditional=False, disc_in_channels=3,
                   disc_start=0, disc_weight=0.75,
                   codebook_weight=1.0)
    msvq_84 = dict(model=msvq_model("f8f4", loss_84),
                   data=data(6, oi_img("train", "random-1d", True),
                             oi_img("validation", "center", False),
                             oi_img("validation", "center", False)),
                   lightning=dict(trainer=dict(max_epochs=50)))
    write("msvqgan/msvqgan_f8f4_openimage.yaml", msvq_84, H)


if __name__ == "__main__":
    main()
