"""
passive
=======

Dense passive stereo matching (disparity map construction).

Parity target: /root/reference/simplestereo/passive.py + _passive.cpp.
"""
