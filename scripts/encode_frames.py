#!/usr/bin/env python
"""Encode a rendered frame directory into a video (Scripts/encodeDir.sh
equivalent: the reference drives mencoder/x264 two-pass + ffmpeg mp4).

Usage: python scripts/encode_frames.py images/balls/4d/1920x1080 [out.mp4]

Falls back to an animated PNG contact sheet note when no encoder binary is
available (this container has zero egress; ffmpeg may be absent)."""

import glob
import os
import shutil
import subprocess
import sys


def main(argv):
    if len(argv) < 1:
        print(__doc__)
        return 1
    frame_dir = argv[0]
    out = argv[1] if len(argv) > 1 else os.path.join(
        frame_dir, "animation.mp4")
    frames = sorted(glob.glob(os.path.join(frame_dir, "*.png")))
    if not frames:
        print(f"no frames in {frame_dir}")
        return 1

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg:
        pattern = frames[0].rsplit("_", 1)[0] + "_%04d.png"
        cmd = [ffmpeg, "-y", "-framerate", "24", "-i", pattern,
               "-c:v", "libx264", "-pix_fmt", "yuv420p", "-crf", "18", out]
        subprocess.run(cmd, check=True)
        print(f"wrote {out}")
        return 0

    # no encoder: build an animated GIF via Pillow as a portable fallback
    from PIL import Image

    imgs = [Image.open(f) for f in frames]
    gif = os.path.splitext(out)[0] + ".gif"
    imgs[0].save(gif, save_all=True, append_images=imgs[1:], duration=1000 // 24,
                 loop=0)
    print(f"ffmpeg unavailable; wrote {gif}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
