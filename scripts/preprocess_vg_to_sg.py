#!/usr/bin/env python
"""Visual Genome scene graphs -> flattened text captions (sg2i input).

Re-design of ``/root/reference/scripts/preprocess_vg_to_sg.py``: reads the
sg2im-style h5 (image_ids, relationship_*, object_names) + vocab.json and
emits a coco-caption-style JSON ``{split}_sg.json`` where each caption is
"subj [A] pred obj [B], ..." with letter disambiguators for repeated object
names.
"""

from __future__ import annotations

import argparse
import json
import os

LETTERS = [chr(ord("A") + i) for i in range(26)] + [
    "AB", "AC", "AD", "AE", "AF"]


def scene_graph_caption(num_rel, rel_objs, rel_sbjs, rel_preds, obj_names,
                        vocab) -> str:
    """Flatten one scene graph into text; repeated object names get letter
    suffixes (A, B, ...) by order of first appearance."""
    name_to_ids: dict = {}
    for i in range(num_rel):
        for oid in (rel_sbjs[i], rel_objs[i]):
            name = vocab["object_idx_to_name"][obj_names[oid]]
            ids = name_to_ids.setdefault(name, [])
            if oid not in ids:
                ids.append(oid)

    words = []
    for i in range(num_rel):
        for oid, is_subj in ((rel_sbjs[i], True), (rel_objs[i], False)):
            name = vocab["object_idx_to_name"][obj_names[oid]]
            if is_subj:
                words.append(name)
                if len(name_to_ids[name]) > 1:
                    words.append(LETTERS[name_to_ids[name].index(oid)])
                words.append(vocab["pred_idx_to_name"][rel_preds[i]])
            else:
                words.append(name)
                if len(name_to_ids[name]) > 1:
                    words.append(LETTERS[name_to_ids[name].index(oid)])
        words.append(",")
    return " ".join(words[:-1]) if words else ""


def main():
    import h5py

    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base_dir", type=str, required=True)
    p.add_argument("-s", "--split", type=str, required=True,
                   choices=["train", "val"])
    args = p.parse_args()

    with open(os.path.join(args.base_dir, "image_data.json")) as f:
        vg_imgs = json.load(f)
    with open(os.path.join(args.base_dir, "vocab.json")) as f:
        vocab = json.load(f)
    h5 = h5py.File(os.path.join(args.base_dir, f"{args.split}.h5"), "r")

    wanted = set(int(i) for i in h5["image_ids"][...])
    images = []
    for ann in vg_imgs:
        if int(ann["image_id"]) not in wanted:
            continue
        images.append(dict(
            license=0, file_name=ann["url"].split("/")[-1],
            coco_url=ann["url"], height=float(ann["height"]),
            width=float(ann["width"]), flickr_url=ann["url"],
            id=int(ann["image_id"])))

    annotations = []
    for img_id, num_rel, rel_objs, rel_sbjs, rel_preds, obj_names in zip(
            h5["image_ids"][...], h5["relationships_per_image"][...],
            h5["relationship_objects"][...],
            h5["relationship_subjects"][...],
            h5["relationship_predicates"][...], h5["object_names"][...]):
        annotations.append(dict(
            image_id=int(img_id), id=int(img_id),
            caption=scene_graph_caption(int(num_rel), rel_objs, rel_sbjs,
                                        rel_preds, obj_names, vocab)))

    out = dict(info={}, licenses=[], images=images, annotations=annotations)
    path = os.path.join(args.base_dir, f"{args.split}_sg.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"wrote {path}: {len(images)} images, {len(annotations)} captions")


if __name__ == "__main__":
    main()
