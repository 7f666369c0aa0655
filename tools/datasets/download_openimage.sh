#!/usr/bin/env bash
# OpenImages v4/v6 subsets used for layout2i pretraining. The detections CSV
# (14.6M boxes) is streamed by frido_tpu/data/open_images.py.
set -e
ROOT=${1:-data/openimages}
mkdir -p "$ROOT"
cd "$ROOT"
for split in train validation test; do
  wget -c "https://storage.googleapis.com/openimages/2018_04/$split/$split-annotations-bbox.csv"
done
wget -c "https://storage.googleapis.com/openimages/2018_04/class-descriptions-boxable.csv"
echo "images: use the official downloader (aws s3 / downloader.py) per" \
     "https://storage.googleapis.com/openimages/web/download.html"
