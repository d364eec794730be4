"""Fourier Transform Profilometry scan -> point cloud
(cf. reference examples/103). The object image of the reference's dataset
is not committed upstream; point OBJ_IMage at your capture."""

import sys

import numpy as np

import simplestereo_tpu as ss
from simplestereo_tpu.imgio import imread

RES = "/root/reference/examples/res/stereoFTP/"
OBJ_IMAGE = sys.argv[1] if len(sys.argv) > 1 else RES + "ellipsoid8.png"

rig = ss.StereoRig.fromFile(RES + "stereoRig.json")
fringe = imread(RES + "fringe8.png")
ftp = ss.active.StereoFTP(rig, fringe, period=8)

imgObj = imread(OBJ_IMAGE)
roi = ss.active.computeROI(imgObj, blackThreshold=10)
cloud = ftp.getCloud(imgObj, roi=roi)

ss.points.exportPLY(np.asarray(cloud), "scan.ply")
print("Saved scan.ply")
