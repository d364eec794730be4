"""ASW vs SGM on the Tsukuba pair with ground-truth evaluation
(cf. reference examples/010)."""

import numpy as np

import simplestereo_tpu as ss
from simplestereo_tpu.imgio import imread, imwrite

RES = "/root/reference/examples/res/tsukuba/"
img1 = imread(RES + "tsukuba_l.png")
img2 = imread(RES + "tsukuba_r.png")
gt = imread(RES + "groundtruth.png", grayscale=True).astype(np.float32) / 16
nonocc = imread(RES + "nonocc.png", grayscale=True) > 0

asw = ss.passive.StereoASW(winSize=35, minDisparity=4, maxDisparity=14,
                           gammaC=15, gammaP=17.5, consistent=True)
dispASW = asw.compute(img1, img2).astype(np.float32)

sgm = ss.passive.StereoSGM(minDisparity=4, numDisparities=10, blockSize=11)
dispSGM = sgm.compute(img1, img2).astype(np.float32) / 16

for name, disp in (("ASW", dispASW), ("SGM", dispSGM)):
    bad = (np.abs(disp - gt) > 2.0) & nonocc
    print(f"{name}: bad-2.0 = {bad.sum() / nonocc.sum():.2%}")
    vis = (disp - disp.min()) / max(np.ptp(disp), 1) * 255
    imwrite(f"tsukuba_{name.lower()}.png", vis.astype(np.uint8))
