#!/usr/bin/env bash
# COCO 2014 (t2i) + 2017 (layout2i/sg2i/label2i) images and annotations.
# Layout expected by taming-style datasets (frido_tpu/data/coco.py):
#   data/coco/{train2014,val2014,train2017,val2017}/
#   data/coco/annotations/{instances,captions,stuff}_*.json
set -e
ROOT=${1:-data/coco}
mkdir -p "$ROOT/annotations"
cd "$ROOT"
for f in train2014 val2014 train2017 val2017; do
  wget -c "http://images.cocodataset.org/zips/$f.zip"
  unzip -n "$f.zip" && rm "$f.zip"
done
for f in annotations_trainval2014 annotations_trainval2017 \
         stuff_annotations_trainval2017; do
  wget -c "http://images.cocodataset.org/annotations/$f.zip"
  unzip -n "$f.zip" && rm "$f.zip"
done
