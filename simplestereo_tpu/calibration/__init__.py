"""
calibration
===========

Camera, stereo and camera-projector calibration.

Parity target: /root/reference/simplestereo/calibration.py. The heavy
numerical core (Levenberg-Marquardt bundle adjustment over reprojection
residuals) runs on device with autodiff Jacobians; corner detection and
pattern bookkeeping are host/NumPy.
"""
