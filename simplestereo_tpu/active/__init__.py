"""
active
======

Structured-light 3D scanning: Gray code, fringe projection (FTP).

Parity target: /root/reference/simplestereo/active.py.
"""
