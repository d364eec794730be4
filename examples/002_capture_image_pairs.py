"""Capture synchronized stereo pairs from two sources
(cf. reference examples/002). Sources can be camera indexes, video files
or URLs; frames are pulled via the threaded ss.utils.Capture grabber."""

import sys

import simplestereo_tpu as ss
from simplestereo_tpu.imgio import imwrite

SRC1, SRC2 = (sys.argv[1], sys.argv[2]) if len(sys.argv) > 2 else (0, 1)

with ss.utils.Capture(SRC1) as cap1, ss.utils.Capture(SRC2) as cap2:
    for i in range(10):
        f1 = cap1.get()
        f2 = cap2.get()
        if f1 is None or f2 is None:
            break
        imwrite(f"{i}_L.png", f1)
        imwrite(f"{i}_R.png", f2)
        print("saved pair", i)
