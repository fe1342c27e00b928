#!/usr/bin/env python
"""Duplicate rendered frames by hard-linking (Scripts/frameDup.sh
equivalent) — for animations that ping-pong, loop, or otherwise reuse
sequences of frames without re-rendering them.

Usage:
  python scripts/frame_dup.py startFrame endFrame step outStart pattern \
      [dest_pattern]

``pattern`` contains a run of X characters where the zero-padded frame
number goes (source numbers use the X-run's width, destination numbers use
6 digits, matching the reference script's %04i -> %06i convention when the
pattern has 4+ X's).

Example (append a reversed copy of frames 0..240 after frame 241):
  python scripts/frame_dup.py 240 0 -1 241 \
      "images/balls/4d/1920x1080/balls_1920x1080_XXXX.png"
"""

import os
import re
import sys


def main(argv):
    if len(argv) < 5:
        print(__doc__)
        return 1
    start_f, end_f, step, out_f = (int(a) for a in argv[:4])
    pattern = argv[4]
    dst_pattern = argv[5] if len(argv) > 5 else pattern
    if step == 0:
        print("step must be nonzero")
        return 1

    m = re.search(r"X+", pattern)
    md = re.search(r"X+", dst_pattern)
    if not m or not md:
        print("pattern must contain a run of X characters")
        return 1
    src_w = len(m.group(0))
    dst_w = max(len(md.group(0)), 6)   # frameDup.sh always emits %06i

    i_frame, o_frame = start_f, out_f
    while True:
        src = pattern[: m.start()] + f"{i_frame:0{src_w}d}" \
            + pattern[m.end():]
        dst = dst_pattern[: md.start()] + f"{o_frame:0{dst_w}d}" \
            + dst_pattern[md.end():]
        if os.path.exists(dst):
            print(f"{dst} already exists.")
            return 1
        try:
            os.link(src, dst)
        except OSError as e:
            print(f"link {src} -> {dst} failed: {e}")
            return 1
        print(f"{src} -> {dst}")
        if i_frame == end_f:
            print(f"Final output frame numbered {o_frame}.")
            return 0
        i_frame += step
        o_frame += 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
