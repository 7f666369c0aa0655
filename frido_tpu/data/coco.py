"""COCO 2014/2017 annotated-objects dataset.

Re-design of ``/root/reference/taming/data/annotated_objects_coco.py``:
instances(+stuff) JSON, caption map, mini-val image-id files, optional
COCO->OpenImages category unification for layout2i finetuning.
"""

from __future__ import annotations

import json
from collections import defaultdict
from csv import reader as TupleReader
from itertools import chain
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, Optional

from frido_tpu.data.annotated_objects import AnnotatedObjectsDataset
from frido_tpu.data.helper_types import Annotation, Category, ImageDescription

COCO_PATH_STRUCTURE = {
    "train": {
        "top_level": "",
        "instances_annotations": "annotations/instances_train2017.json",
        "stuff_annotations": "annotations/stuff_train2017.json",
        "files": "train2017",
    },
    "validation": {
        "top_level": "",
        "instances_annotations": "annotations/instances_val2017.json",
        "stuff_annotations": "annotations/stuff_val2017.json",
        "files": "val2017",
    },
}

COCO_PATH_STRUCTURE_14 = {
    "train": {
        "top_level": "",
        "instances_annotations": "annotations/instances_train2014.json",
        "files": "train2014",
    },
    "validation": {
        "top_level": "",
        "instances_annotations": "annotations/instances_val2014.json",
        "files": "val2014",
    },
}


def load_image_descriptions(description_json: List[Dict]) -> Dict[str, ImageDescription]:
    return {
        str(img["id"]): ImageDescription(
            id=img["id"],
            license=img.get("license"),
            file_name=img["file_name"],
            coco_url=img.get("coco_url"),
            original_size=(img["width"], img["height"]),
            date_captured=img.get("date_captured"),
            flickr_url=img.get("flickr_url"),
        )
        for img in description_json
    }


def load_categories(category_json: Iterable) -> Dict[str, Category]:
    return {str(c["id"]): Category(id=str(c["id"]),
                                   super_category=c["supercategory"],
                                   name=c["name"])
            for c in category_json if c["name"] != "other"}


def load_annotations(annotations_json: List[Dict], image_descriptions,
                     category_no_for_id: Callable[[str], int], split: str,
                     coco_to_oi_cate_id: Optional[Dict] = None):
    annotations = defaultdict(list)
    for ann in chain(*annotations_json):
        image_id = str(ann["image_id"])
        if image_id not in image_descriptions:
            raise ValueError(f"image_id [{image_id}] has no description.")
        category_id = ann["category_id"]
        if coco_to_oi_cate_id is not None:
            category_id = coco_to_oi_cate_id.get(str(category_id), category_id)
        try:
            category_no = category_no_for_id(str(category_id))
        except KeyError:
            continue
        width, height = image_descriptions[image_id].original_size
        bbox = (ann["bbox"][0] / width, ann["bbox"][1] / height,
                ann["bbox"][2] / width, ann["bbox"][3] / height)
        annotations[image_id].append(Annotation(
            id=ann["id"],
            area=bbox[2] * bbox[3],  # bbox area, not segmentation area
            is_group_of=ann["iscrowd"],
            image_id=ann["image_id"],
            bbox=bbox,
            category_id=str(category_id),
            category_no=category_no,
        ))
    return dict(annotations)


def load_categories_oi(csv_path: Path) -> Dict[str, Category]:
    with open(csv_path) as f:
        return {row[0]: Category(id=row[0], name=row[1], super_category=None)
                for row in TupleReader(f)}


class AnnotatedObjectsCoco(AnnotatedObjectsDataset):
    def __init__(self, use_things: bool = True, use_stuff: bool = True,
                 img_id_file: Optional[str] = None,
                 caption_ann_path: Optional[str] = None,
                 stuff_only: bool = False, OI_cate_path: str = "",
                 specific_img_ids: List[str] = (), num_sample: int = -1,
                 **kwargs):
        super().__init__(**kwargs)
        self.use_things = use_things
        self.use_stuff = use_stuff
        self.caption_ann_path = caption_ann_path

        with open(self.paths["instances_annotations"]) as f:
            inst_data_json = json.load(f)
        stuff_data_json = None
        if use_stuff:
            with open(self.paths["stuff_annotations"]) as f:
                stuff_data_json = json.load(f)
        if caption_ann_path is not None:
            with open(caption_ann_path) as f:
                self._setup_caption(json.load(f))

        img_id_used = {}
        if img_id_file is not None:
            with open(img_id_file) as f:
                lines = f.readlines()
            if num_sample != -1:
                lines = lines[:num_sample]
            img_id_used = {line.rstrip(): 1 for line in lines}

        category_jsons, annotation_jsons = [], []
        if use_things:
            category_jsons.append(inst_data_json["categories"])
            annotation_jsons.append(inst_data_json["annotations"])
        if use_stuff:
            category_jsons.append(stuff_data_json["categories"])
            annotation_jsons.append(stuff_data_json["annotations"])

        image_ids_with_stuff = None
        if stuff_only and stuff_data_json is not None:
            image_ids_with_stuff = {
                str(a["image_id"]) for a in stuff_data_json["annotations"]}

        self.categories = load_categories(chain(*category_jsons))
        coco_to_oi = None
        if OI_cate_path:
            # COCO->OpenImages category unification (coco.py:187-203)
            self.categories_OI = load_categories_oi(OI_cate_path)
            oi_raw = (["-".join(v.name.lower().split(" "))
                       for v in self.categories_OI.values()]
                      + [v.name.lower() for v in self.categories_OI.values()])
            oi_ids = list(self.categories_OI.keys()) * 2
            coco_to_oi = {}
            self.categories_append = {}
            for k, v in self.categories.items():
                if v.name not in oi_raw:
                    self.categories_append[k] = v
                else:
                    coco_to_oi[k] = oi_ids[oi_raw.index(v.name)]
            self.categories = self.categories_OI

        self.filter_categories()
        self.setup_category_id_and_number()
        self.image_descriptions = load_image_descriptions(
            inst_data_json["images"])
        annotations = load_annotations(
            annotation_jsons, self.image_descriptions,
            self.get_category_number, self.split, coco_to_oi)
        self.annotations = self.filter_object_number(
            annotations, self.min_object_area, self.min_objects_per_image,
            self.max_objects_per_image)
        self.image_ids = sorted(self.annotations.keys())
        if image_ids_with_stuff is not None:
            self.image_ids = [i for i in self.image_ids
                              if i in image_ids_with_stuff]
        if img_id_used:
            self.image_ids = [
                i for i in self.image_ids
                if "{:012d}".format(int(i)) in img_id_used]
        if caption_ann_path is not None:
            cap_ids = set(self.img_id_to_caption_list.keys())
            self.image_ids = sorted(set(self.image_ids) & cap_ids)
        self.clean_up_annotations_and_image_descriptions()
        if specific_img_ids:
            wanted = set(specific_img_ids)
            self.image_ids = [i for i in self.image_ids if i in wanted]

    def _setup_caption(self, caption_data_json) -> None:
        m: Dict[str, List[str]] = {}
        for ann in caption_data_json["annotations"]:
            m.setdefault(str(ann["image_id"]), []).append(
                ann["caption"].replace(".", ""))
        self.img_id_to_caption_list = m

    def get_path_structure(self) -> Dict[str, str]:
        if self.split not in COCO_PATH_STRUCTURE:
            raise ValueError(f"Split [{self.split}] does not exist for COCO.")
        if "2017" in str(self.data_path):
            return COCO_PATH_STRUCTURE[self.split]
        if "2014" in str(self.data_path):
            return COCO_PATH_STRUCTURE_14[self.split]
        raise ValueError("Incorrect data structure.")

    def get_image_path(self, image_id: str) -> Path:
        return self.paths["files"].joinpath(
            self.image_descriptions[str(image_id)].file_name)

    def get_image_description(self, image_id: str) -> Dict[str, Any]:
        return self.image_descriptions[image_id]._asdict()

    def get_image_caption(self, image_id: str) -> List[str]:
        return self.img_id_to_caption_list[image_id]

    def __getitem__(self, n: int) -> Dict[str, Any]:
        sample = self._base_sample(n)
        if self.caption_ann_path is not None:
            sample["caption"] = self.get_image_caption(
                self.get_image_id(n))[0]
        for conditional, builder in self.conditional_builders.items():
            if conditional in self.keys:
                sample[conditional] = builder.build(
                    sample["annotations"], sample["crop_bbox"],
                    sample["flipped"])
        if self.keys:
            sample = {k: sample[k] for k in self.keys}
        return sample
