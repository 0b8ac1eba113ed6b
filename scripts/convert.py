#!/usr/bin/env python
"""COLMAP SfM preprocessing wrapper (parity target: /root/reference/convert.py).

Runs feature extraction -> matching -> mapper -> undistortion on a folder
of input images, then optional downscaled copies (images_2/4/8), producing
the directory layout scripts/train.py expects. Requires the external
``colmap`` binary (and ImageMagick ``magick`` for --resize), exactly like
the reference.
"""

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd: str) -> None:
    print("+", cmd, flush=True)
    code = subprocess.call(cmd, shell=True)
    if code != 0:
        print(f"command failed ({code}): {cmd}", file=sys.stderr)
        sys.exit(code)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--camera", default="OPENCV")
    p.add_argument("--colmap_executable", default="colmap")
    p.add_argument("--magick_executable", default="magick")
    p.add_argument("--no_gpu", action="store_true")
    p.add_argument("--skip_matching", action="store_true")
    p.add_argument("--resize", action="store_true")
    a = p.parse_args()

    colmap = a.colmap_executable
    use_gpu = 0 if a.no_gpu else 1
    src = a.source_path

    if not a.skip_matching:
        os.makedirs(f"{src}/distorted/sparse", exist_ok=True)
        run(f"{colmap} feature_extractor"
            f" --database_path {src}/distorted/database.db"
            f" --image_path {src}/input"
            f" --ImageReader.single_camera 1"
            f" --ImageReader.camera_model {a.camera}"
            f" --SiftExtraction.use_gpu {use_gpu}")
        run(f"{colmap} exhaustive_matcher"
            f" --database_path {src}/distorted/database.db"
            f" --SiftMatching.use_gpu {use_gpu}")
        run(f"{colmap} mapper"
            f" --database_path {src}/distorted/database.db"
            f" --image_path {src}/input"
            f" --output_path {src}/distorted/sparse"
            f" --Mapper.ba_global_function_tolerance=0.000001")

    run(f"{colmap} image_undistorter"
        f" --image_path {src}/input"
        f" --input_path {src}/distorted/sparse/0"
        f" --output_path {src}"
        f" --output_type COLMAP")

    # move sparse/* into sparse/0 (the layout the readers expect)
    sparse = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for fn in os.listdir(sparse):
        if fn == "0":
            continue
        shutil.move(os.path.join(sparse, fn), os.path.join(sparse, "0", fn))

    if a.resize:
        images = os.path.join(src, "images")
        for factor in (2, 4, 8):
            out = os.path.join(src, f"images_{factor}")
            os.makedirs(out, exist_ok=True)
            for fn in os.listdir(images):
                dst = os.path.join(out, fn)
                shutil.copy2(os.path.join(images, fn), dst)
                run(f"{a.magick_executable} mogrify -resize "
                    f"{100.0 / factor}% {dst}")
    print("Done.")


if __name__ == "__main__":
    main()
