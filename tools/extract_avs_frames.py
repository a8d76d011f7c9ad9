#!/usr/bin/env python
"""AVSBench frame extraction (reference utils/s4_preprocess.py,
utils/ms3_preprocess.py): sample frames from the trimmed videos — the
last frame of each second for 5 seconds (the reference's
last-frame-of-second selection at 16 fps).

Requires imageio with an available video backend (ffmpeg); gated with a
clear error otherwise (this environment ships imageio but no ffmpeg).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def extract(video_path: str, out_dir: str, video_name: str,
            seconds: int = 5, fps: int = 16):
    import imageio.v3 as iio
    from PIL import Image
    frames = iio.imread(video_path, plugin="pyav")  # [T, H, W, 3]
    os.makedirs(out_dir, exist_ok=True)
    for s in range(1, seconds + 1):
        idx = min(s * fps - 1, len(frames) - 1)  # last frame of second s
        Image.fromarray(np.asarray(frames[idx])).save(
            os.path.join(out_dir, f"{video_name}_{s}.png"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_root", required=True)
    p.add_argument("--out_root", required=True)
    p.add_argument("--seconds", type=int, default=5)
    p.add_argument("--fps", type=int, default=16)
    args = p.parse_args()
    try:
        import imageio.v3  # noqa: F401
    except ImportError:
        raise SystemExit("imageio (with a video backend) is required")
    n = 0
    for root, _, files in os.walk(args.video_root):
        for f in files:
            if f.endswith(".mp4"):
                name = os.path.splitext(f)[0]
                rel = os.path.relpath(root, args.video_root)
                extract(os.path.join(root, f),
                        os.path.join(args.out_root, rel, name), name,
                        args.seconds, args.fps)
                n += 1
    print(f"extracted frames from {n} videos")


if __name__ == "__main__":
    main()
