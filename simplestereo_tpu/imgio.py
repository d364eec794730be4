"""
imgio
=====

Minimal image I/O built on Pillow (the framework does not depend on OpenCV).

Convention: like the reference (which uses ``cv2.imread``), color images are
returned/accepted as **BGR** uint8 arrays, so that pixel-level parity tests
against the reference's committed golden images are direct.
"""

import numpy as np


def imread(path, grayscale=False):
    """Read an image file to a numpy array (BGR for color, like cv2.imread).

    Parameters
    ----------
    path : str
    grayscale : bool
        If True, convert to single-channel luminance (ITU-R 601, like
        OpenCV's IMREAD_GRAYSCALE).

    Returns
    -------
    numpy.ndarray
        (H, W) uint8 if grayscale, else (H, W, 3) uint8 BGR.
    """
    from PIL import Image

    img = Image.open(path)
    if grayscale:
        return np.asarray(img.convert("L"))
    arr = np.asarray(img.convert("RGB"))
    return arr[:, :, ::-1].copy()  # RGB -> BGR


def imwrite(path, image):
    """Write a numpy array to an image file (expects BGR for color)."""
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        arr = arr[:, :, ::-1]  # BGR -> RGB
    Image.fromarray(arr).save(path)
