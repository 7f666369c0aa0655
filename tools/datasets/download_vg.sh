#!/usr/bin/env bash
# Visual Genome v1.4: images + scene-graph JSONs. After download run
#   python3 scripts/convert_vg_to_coco_style.py   (layout2i boxes)
#   python3 scripts/preprocess_vg_to_sg.py        (sg2i captions)
set -e
ROOT=${1:-data/vg}
mkdir -p "$ROOT"
cd "$ROOT"
for f in images.zip images2.zip; do
  wget -c "https://cs.stanford.edu/people/rak248/VG_100K_2/$f"
  unzip -n "$f" && rm "$f"
done
for f in objects.json.zip relationships.json.zip image_data.json.zip \
         attributes.json.zip region_descriptions.json.zip; do
  wget -c "https://visualgenome.org/static/data/dataset/$f"
  unzip -n "$f" && rm "$f"
done
