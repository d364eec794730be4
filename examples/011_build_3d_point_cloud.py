"""Full pipeline: rectify -> SGM disparity -> Q reprojection -> PLY
(cf. reference examples/011)."""

import numpy as np

import simplestereo_tpu as ss
from simplestereo_tpu.imgio import imread

RES = "/root/reference/examples/res/2/"
rigRect = ss.RectifiedStereoRig.fromFile(RES + "rigRect.json")
img1, img2 = rigRect.rectifyImages(
    imread(RES + "lawn_L.png"), imread(RES + "lawn_R.png"))

stereo = ss.passive.StereoSGM(minDisparity=1, numDisparities=96,
                              blockSize=7, speckleWindowSize=120)
disparity = stereo.compute(img1, img2).astype(np.float32) / 16

points3D = rigRect.get3DPoints(disparity)
ss.points.exportPLY(np.asarray(points3D), "lawn.ply", referenceImage=img1)
print("Saved lawn.ply")
