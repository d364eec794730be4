"""Dense disparity with the built-in SGM matcher — the TPU-native
replacement for the reference's cv2.StereoSGBM call (examples/008)."""

import numpy as np

import simplestereo_tpu as ss
from simplestereo_tpu.imgio import imread, imwrite

RES = "/root/reference/examples/res/2/"
rigRect = ss.RectifiedStereoRig.fromFile(RES + "rigRect.json")
img1, img2 = rigRect.rectifyImages(
    imread(RES + "lawn_L.png"), imread(RES + "lawn_R.png"))

stereo = ss.passive.StereoSGM(minDisparity=1, numDisparities=96,
                              blockSize=7)
disparity = stereo.compute(img1, img2).astype(np.float32) / 16

vis = (disparity - disparity.min()) / max(np.ptp(disparity), 1) * 255
imwrite("disparity_sgm.png", vis.astype(np.uint8))
print("Saved disparity_sgm.png")
