"""Visual Genome boxes in coco-style JSON (layout2i).

Re-design of ``/root/reference/taming/data/annotated_objects_vg_cocostyle.py``
— identical pipeline to the COCO dataset over the ``*_coco_style.json``
files produced by ``scripts/convert_vg_to_coco_style.py``.
"""

from __future__ import annotations

from typing import Dict

from frido_tpu.data.coco import AnnotatedObjectsCoco

VG_COCOSTYLE_PATH_STRUCTURE = {
    "train": {"top_level": "",
              "instances_annotations": "train_coco_style.json",
              "files": "VG_100K"},
    "validation": {"top_level": "",
                   "instances_annotations": "val_coco_style.json",
                   "files": "VG_100K"},
}


class AnnotatedObjectsVgCocoStyle(AnnotatedObjectsCoco):
    def get_path_structure(self) -> Dict[str, str]:
        if self.split not in VG_COCOSTYLE_PATH_STRUCTURE:
            raise ValueError(
                f"Split [{self.split}] does not exist for VG-cocostyle.")
        return VG_COCOSTYLE_PATH_STRUCTURE[self.split]
