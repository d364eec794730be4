"""Dense disparity with the Pallas adaptive-support-weight matcher
(cf. reference examples/009; unlike the reference's C++ version, no
pre-downscaling is needed on TPU)."""

import numpy as np

import simplestereo_tpu as ss
from simplestereo_tpu.imgio import imread, imwrite

RES = "/root/reference/examples/res/2/"
rigRect = ss.RectifiedStereoRig.fromFile(RES + "rigRect.json")
img1, img2 = rigRect.rectifyImages(
    imread(RES + "lawn_L.png"), imread(RES + "lawn_R.png"))

stereo = ss.passive.StereoASW(winSize=35, maxDisparity=90, minDisparity=1,
                              gammaC=15, gammaP=17.5, consistent=True)
disparity = stereo.compute(img1, img2)

vis = (disparity - disparity.min()) / max(np.ptp(disparity), 1) * 255
imwrite("disparity_asw.png", vis.astype(np.uint8))
print("Saved disparity_asw.png")
