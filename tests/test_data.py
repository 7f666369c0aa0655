"""Data layer tests on a synthetic mini-COCO tree."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from frido_tpu.data.coco import AnnotatedObjectsCoco
from frido_tpu.data.conditional_builder import (
    ObjectsBoundingBoxConditionalBuilder,
    ObjectsCenterPointsConditionalBuilder,
    ObjectsConditionalBuilder,
)
from frido_tpu.data.datamodule import (
    DataLoader,
    DataModuleFromConfig,
    collate,
    split_indices_deterministic,
)
from frido_tpu.data.helper_types import Annotation

# <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    """Synthetic COCO-2017-style tree: 6 images, 2 categories."""
    root = tmp_path_factory.mktemp("coco2017")
    (root / "annotations").mkdir()
    (root / "train2017").mkdir()
    (root / "val2017").mkdir()

    rng = np.random.RandomState(0)
    images, annotations = [], []
    captions = []
    for i in range(6):
        fname = f"{i:012d}.jpg"
        w, h = 64 + 16 * (i % 3), 64
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
            root / "val2017" / fname)
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
            root / "train2017" / fname)
        images.append({"id": i, "file_name": fname, "width": w, "height": h,
                       "coco_url": ""})
        for j in range(2 + i % 2):
            annotations.append({
                "id": 10 * i + j, "image_id": i,
                "category_id": 1 + (j % 2), "iscrowd": 0,
                "bbox": [4.0 + j, 5.0, 20.0, 24.0],
            })
        captions.append({"image_id": i, "id": 1000 + i,
                         "caption": f"a synthetic photo number {i}."})
    cats = [{"id": 1, "name": "cat", "supercategory": "animal"},
            {"id": 2, "name": "dog", "supercategory": "animal"}]
    inst = {"images": images, "annotations": annotations, "categories": cats}
    for split in ["train2017", "val2017"]:
        with open(root / "annotations" / f"instances_{split}.json", "w") as f:
            json.dump(inst, f)
        with open(root / "annotations" / f"captions_{split}.json", "w") as f:
            json.dump({"annotations": captions}, f)
        # path-structure validation requires the stuff files to exist
        with open(root / "annotations" / f"stuff_{split}.json", "w") as f:
            json.dump({"images": images, "annotations": [], "categories": []},
                      f)
    return root


def make_dataset(coco_root, **kw):
    args = dict(
        data_path=str(coco_root), split="validation",
        keys=["image", "caption", "objects_bbox", "file_name", "annotations"],
        target_image_size=32, min_object_area=0.0001,
        min_objects_per_image=0, max_objects_per_image=8,
        crop_method="center", random_flip=False, no_tokens=256,
        use_group_parameter=True, encode_crop=False, use_stuff=False,
        caption_ann_path=str(coco_root / "annotations/captions_val2017.json"),
    )
    args.update(kw)
    return AnnotatedObjectsCoco(**args)


def test_dataset_sample(coco_root):
    ds = make_dataset(coco_root)
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["image"].dtype == np.float32
    assert -1.0 <= s["image"].min() and s["image"].max() <= 1.0
    assert s["caption"].startswith("a synthetic photo")
    assert s["objects_bbox"].shape == (8 * 3,)  # triples padded to max
    assert s["objects_bbox"].dtype == np.int64
    assert isinstance(s["annotations"][0], Annotation)


def test_builder_roundtrip():
    b = ObjectsBoundingBoxConditionalBuilder(
        no_object_classes=10, no_max_objects=4, no_tokens=256,
        encode_crop=False, use_group_parameter=True,
        use_additional_parameters=False)
    anns = [
        Annotation(area=0.1, image_id="0", bbox=(0.1, 0.2, 0.3, 0.4),
                   category_no=3, category_id="3", is_group_of=False),
        Annotation(area=0.1, image_id="0", bbox=(0.5, 0.5, 0.2, 0.2),
                   category_no=7, category_id="7", is_group_of=True),
    ]
    tokens = b.build(anns, None, False)
    assert tokens.shape == (12,)
    objs, _ = b.inverse_build(tokens)
    assert len(objs) == 2
    reps = sorted(o[0] for o in objs)
    assert reps == sorted([3, 7 + 10])  # group flag adds no_object_classes
    # bbox roundtrip within grid resolution
    for rep, bbox in objs:
        if rep == 3:
            np.testing.assert_allclose(bbox, (0.1, 0.2, 0.3, 0.4), atol=0.08)


def test_center_points_and_objects_builders():
    anns = [Annotation(area=0.1, image_id="0", bbox=(0.2, 0.2, 0.2, 0.2),
                       category_no=1, category_id="1", is_group_of=False)]
    cp = ObjectsCenterPointsConditionalBuilder(5, 3, 256, False, True, False)
    t = cp.build(anns)
    assert t.shape == (6,)
    ob = ObjectsConditionalBuilder(5, 3, 256, False, True, False)
    t2 = ob.build(anns)
    assert t2.shape == (3,)
    assert t2[0] == 1 and t2[1] == ob.none


def test_crop_rescaled_annotations(coco_root):
    ds = make_dataset(coco_root, crop_method="random-1d", random_flip=True)
    s = ds[2]
    tokens = s["objects_bbox"]
    b = ds.conditional_builders["objects_bbox"]
    objs, _ = b.inverse_build(tokens)
    for _, bbox in objs:
        assert 0.0 <= bbox[0] <= 1.0 and 0.0 <= bbox[1] <= 1.0


def test_collate_ragged():
    batch = collate([
        {"image": np.zeros((4, 4, 3), np.float32), "caption": "a",
         "annotations": [1, 2]},
        {"image": np.ones((4, 4, 3), np.float32), "caption": "b",
         "annotations": [3]},
    ])
    assert batch["image"].shape == (2, 4, 4, 3)
    assert batch["caption"] == ["a", "b"]
    assert batch["annotations"] == [[1, 2], [3]]


def test_split_indices_cover_and_disjoint():
    parts = [split_indices_deterministic(10, 3, i) for i in range(3)]
    allidx = sorted(sum(parts, []))
    assert allidx == list(range(10))
    assert split_indices_deterministic(10, 3, 1) == parts[1]  # deterministic


def test_datamodule_and_loader(coco_root):
    dm = DataModuleFromConfig(
        batch_size=2,
        test={
            "target": "taming.data.annotated_objects_coco.AnnotatedObjectsCoco",
            "params": dict(
                data_path=str(coco_root), split="validation",
                keys=["image", "caption", "file_name"],
                target_image_size=32, min_object_area=0.0001,
                min_objects_per_image=0, max_objects_per_image=8,
                crop_method="center", random_flip=False, no_tokens=256,
                use_group_parameter=True, encode_crop=False, use_stuff=False,
                caption_ann_path=str(
                    coco_root / "annotations/captions_val2017.json"),
            ),
        },
        num_workers=2, n_split_dataset=2, idx_split_dataset=0,
    )
    loader = dm.test_dataloader()
    batches = list(loader)
    total = sum(b["image"].shape[0] for b in batches)
    assert total == 3  # half of 6 (shard 0 of 2)
    assert batches[0]["image"].shape[1:] == (32, 32, 3)


class _IdxDataset:
    """Trivial dataset: item i -> {'x': i} (loader-mechanics tests)."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.asarray([i])}


def _drain(loader, n_batches):
    out = []
    while len(out) < n_batches:  # re-iterating starts the next epoch
        for b in loader:
            out.append(tuple(b["x"].ravel().tolist()))
            if len(out) == n_batches:
                break
    return out


def test_loader_cursor_mid_epoch_resume():
    """set_cursor(epoch, k) must replay the uninterrupted run's batch
    sequence from batch k of that epoch (VERDICT round-1 item #9)."""
    from frido_tpu.data.datamodule import DataLoader

    mk = lambda: DataLoader(_IdxDataset(16), batch_size=4, shuffle=True,
                            num_workers=1, drop_last=True)
    baseline = mk()
    seq = _drain(baseline, 8)  # 2 epochs x 4 batches

    resumed = mk()
    _ = _drain(resumed, 2)  # "crash" after 2 batches of epoch 0
    resumed = mk()
    resumed.set_cursor(0, 2)
    assert _drain(resumed, 6) == seq[2:]


def test_loader_epochs_reshuffle():
    """Consecutive epochs of ONE loader must use different shuffle orders
    (a fresh loader per epoch would replay epoch 0 forever)."""
    from frido_tpu.data.datamodule import DataLoader

    loader = DataLoader(_IdxDataset(16), batch_size=4, shuffle=True,
                        num_workers=1, drop_last=True)
    e0 = _drain(loader, 4)
    e1 = _drain(loader, 4)
    assert e0 != e1
    assert sorted(x for b in e0 for x in b) == sorted(
        x for b in e1 for x in b)
