"""
rigs
====

Stereo rig data model: :class:`StereoRig`, :class:`RectifiedStereoRig` and
:class:`StructuredLightRig`.

Parity target: /root/reference/simplestereo/_rigs.py. The JSON persistence
schema is byte-compatible with the reference (same keys:
``res1, res2, intrinsic1, intrinsic2, R, T, distCoeffs1, distCoeffs2
[, F, E, reprojectionError]`` plus ``Rcommon, rectHomography1,
rectHomography2`` for rectified rigs), so rigs calibrated with either
framework can be exchanged and cross-validated.

Design: rig state is host-side numpy float64 (control plane); the image-size
operations (``rectifyImages``, ``undistortImages``, ``get3DPoints``,
``triangulate``) dispatch to jitted JAX code in :mod:`warp` and
:mod:`geometry`.
"""

import json

import numpy as np
import jax.numpy as jnp

from . import warp
from . import utils
from .geometry import npgeom


class StereoRig:
    """Container for all parameters of a calibrated two-view rig.

    Parameters mirror the reference (_rigs.py:22-66): ``res1``/``res2`` are
    (width, height); ``intrinsic1``/``intrinsic2`` 3x3; ``distCoeffs*`` of
    length 0/4/5/8/12/14 (default zeros(5)); ``R``/``T`` map camera-1
    coordinates into camera-2 (world origin in camera 1); optional ``E``,
    ``F`` and calibration ``reprojectionError``.
    """

    def __init__(self, res1, res2, intrinsic1, intrinsic2, distCoeffs1,
                 distCoeffs2, R, T, F=None, E=None, reprojectionError=None):
        self.res1 = tuple(res1)
        self.res2 = tuple(res2)
        self.intrinsic1 = intrinsic1
        self.intrinsic2 = intrinsic2
        self.distCoeffs1 = distCoeffs1
        self.distCoeffs2 = distCoeffs2
        self.R = R
        self.T = T
        self.F = F
        self.E = E
        self.reprojectionError = reprojectionError

    # -- coercing properties (parity with _rigs.py:68-130) -----------------

    @property
    def intrinsic1(self):
        return self._intrinsic1

    @intrinsic1.setter
    def intrinsic1(self, v):
        self._intrinsic1 = np.asarray(v, np.float64).reshape(3, 3)

    @property
    def intrinsic2(self):
        return self._intrinsic2

    @intrinsic2.setter
    def intrinsic2(self, v):
        self._intrinsic2 = np.asarray(v, np.float64).reshape(3, 3)

    @property
    def distCoeffs1(self):
        return self._distCoeffs1

    @distCoeffs1.setter
    def distCoeffs1(self, d):
        self._distCoeffs1 = np.asarray(d, np.float64).ravel() if d is not None else np.zeros(5)

    @property
    def distCoeffs2(self):
        return self._distCoeffs2

    @distCoeffs2.setter
    def distCoeffs2(self, d):
        self._distCoeffs2 = np.asarray(d, np.float64).ravel() if d is not None else np.zeros(5)

    @property
    def R(self):
        return self._R

    @R.setter
    def R(self, v):
        self._R = np.asarray(v, np.float64).reshape(3, 3)

    @property
    def T(self):
        return self._T

    @T.setter
    def T(self, v):
        self._T = np.asarray(v, np.float64).reshape(-1, 1)

    @property
    def F(self):
        return self._F

    @F.setter
    def F(self, v):
        self._F = np.asarray(v, np.float64).reshape(3, 3) if v is not None else None

    @property
    def E(self):
        return self._E

    @E.setter
    def E(self, v):
        self._E = np.asarray(v, np.float64).reshape(3, 3) if v is not None else None

    # -- persistence (schema parity with _rigs.py:132-191) -----------------

    @classmethod
    def fromFile(cls, filepath):
        """Load a rig from the reference-compatible JSON schema."""
        with open(filepath, "r") as f:
            data = json.load(f)
        return cls(
            tuple(data.get("res1")),
            tuple(data.get("res2")),
            data.get("intrinsic1"),
            data.get("intrinsic2"),
            data.get("distCoeffs1"),
            data.get("distCoeffs2"),
            data.get("R"),
            data.get("T"),
            data.get("F"),
            data.get("E"),
            data.get("reprojectionError"),
        )

    def _state_dict(self):
        out = {}
        out["res1"] = list(self.res1)
        out["res2"] = list(self.res2)
        out["intrinsic1"] = self.intrinsic1.tolist()
        out["intrinsic2"] = self.intrinsic2.tolist()
        out["R"] = self.R.tolist()
        out["T"] = self.T.tolist()
        out["distCoeffs1"] = self.distCoeffs1.tolist()
        out["distCoeffs2"] = self.distCoeffs2.tolist()
        if self.F is not None:
            out["F"] = self.F.tolist()
        if self.E is not None:
            out["E"] = self.E.tolist()
        if self.reprojectionError:
            out["reprojectionError"] = float(self.reprojectionError)
        return out

    def save(self, filepath):
        """Save to the reference-compatible JSON schema."""
        with open(filepath, "w") as f:
            json.dump(self._state_dict(), f, indent=4)

    # -- derived geometry (parity with _rigs.py:193-283) -------------------

    def getCenters(self):
        """Camera centers in world coordinates (camera 1 is the origin)."""
        Po1, Po2 = self.getProjectionMatrices()
        C1 = np.zeros(3)
        C2 = -np.linalg.inv(Po2[:, :3]) @ Po2[:, 3]
        return C1, C2

    def getBaseline(self):
        """Norm of the vector from camera 1 to camera 2."""
        _, C2 = self.getCenters()
        return float(np.linalg.norm(C2))

    def getProjectionMatrices(self):
        """3x4 projection matrices P1 = [K1|0], P2 = K2 [R|T]."""
        Po1 = np.hstack((self.intrinsic1, np.zeros((3, 1))))
        Po2 = self.intrinsic2 @ np.hstack((self.R, self.T))
        return Po1, Po2

    def getFundamentalMatrix(self):
        """Fundamental matrix; computed on demand if not set.

        Uses the Hartley-Zisserman composition
        ``F = K2^-T R K1^T [K1 R^T T]_x`` (same as reference _rigs.py:259-260).
        """
        if self.F is None:
            vv = utils.getCrossProductMatrix(self.intrinsic1 @ self.R.T @ self.T)
            self.F = np.linalg.inv(self.intrinsic2).T @ self.R @ self.intrinsic1.T @ vv
        return self.F

    def getEssentialMatrix(self):
        """Essential matrix E = K2^T F K1; computed on demand if not set."""
        if self.E is None:
            F = self.getFundamentalMatrix()
            self.E = self.intrinsic2.T @ F @ self.intrinsic1
        return self.E

    def undistortImages(self, img1, img2, changeCameras=False, alpha=1,
                        destDims=None, centerPrincipalPoint=False):
        """Undistort an image pair on device.

        Equivalent of _rigs.py:285-338 (cv2.getOptimalNewCameraMatrix +
        cv2.undistort), including the arity quirk: with
        ``changeCameras=True`` the two new camera matrices are returned too.
        """
        if changeCameras:
            K1new, _ = warp.get_optimal_new_camera_matrix(
                self.intrinsic1, self.distCoeffs1, self.res1, alpha, destDims,
                centerPrincipalPoint)
            K2new, _ = warp.get_optimal_new_camera_matrix(
                self.intrinsic2, self.distCoeffs2, self.res2, alpha, destDims,
                centerPrincipalPoint)
            u1 = warp.undistort_image(img1, self.intrinsic1, self.distCoeffs1, K1new)
            u2 = warp.undistort_image(img2, self.intrinsic2, self.distCoeffs2, K2new)
            return np.asarray(u1), np.asarray(u2), K1new, K2new
        u1 = warp.undistort_image(img1, self.intrinsic1, self.distCoeffs1)
        u2 = warp.undistort_image(img2, self.intrinsic2, self.distCoeffs2)
        return np.asarray(u1), np.asarray(u2)


class RectifiedStereoRig(StereoRig):
    """A calibrated rig plus pixel-domain rectifying homographies.

    As in the reference (_rigs.py:341-359), the stored transforms are the
    literature's *image homographies*, not OpenCV's object-space rotations;
    the conversion used for map building is ``R_obj = H @ K`` composition
    handled internally. ``K1``/``K2`` accumulate every affine applied after
    rectification and are what 3D reconstruction must use.
    """

    def __init__(self, Rcommon, rectHomography1, rectHomography2, *args):
        self.Rcommon = Rcommon
        self.rectHomography1 = rectHomography1
        self.rectHomography2 = rectHomography2
        self.K1 = None
        self.K2 = None

        if isinstance(args[0], StereoRig):
            r = args[0]
            super().__init__(r.res1, r.res2, r.intrinsic1, r.intrinsic2,
                             r.distCoeffs1, r.distCoeffs2, r.R, r.T, r.F, r.E,
                             r.reprojectionError)
        else:
            super().__init__(*args)

        self.computeRectificationMaps()

    @property
    def Rcommon(self):
        return self._Rcommon

    @Rcommon.setter
    def Rcommon(self, v):
        self._Rcommon = np.asarray(v, np.float64).reshape(3, 3)

    @property
    def rectHomography1(self):
        return self._rectHomography1

    @rectHomography1.setter
    def rectHomography1(self, v):
        self._rectHomography1 = np.asarray(v, np.float64).reshape(3, 3)

    @property
    def rectHomography2(self):
        return self._rectHomography2

    @rectHomography2.setter
    def rectHomography2(self, v):
        self._rectHomography2 = np.asarray(v, np.float64).reshape(3, 3)

    @classmethod
    def fromFile(cls, filepath):
        """Load from the reference-compatible rectified-rig JSON schema."""
        with open(filepath, "r") as f:
            data = json.load(f)
        return cls(
            data.get("Rcommon"),
            data.get("rectHomography1"),
            data.get("rectHomography2"),
            data.get("res1"),
            data.get("res2"),
            data.get("intrinsic1"),
            data.get("intrinsic2"),
            data.get("distCoeffs1"),
            data.get("distCoeffs2"),
            data.get("R"),
            data.get("T"),
            data.get("F"),
            data.get("E"),
            data.get("reprojectionError"),
        )

    def save(self, filepath):
        """Save to the reference-compatible rectified-rig JSON schema."""
        out = {
            "Rcommon": self.Rcommon.tolist(),
            "rectHomography1": self.rectHomography1.tolist(),
            "rectHomography2": self.rectHomography2.tolist(),
        }
        out.update(self._state_dict())
        with open(filepath, "w") as f:
            json.dump(out, f, indent=4)

    def getRectifiedProjectionMatrices(self):
        """3x4 projection matrices after rectification (shared Rcommon)."""
        C1, C2 = self.getCenters()
        P1 = self.K1 @ self.Rcommon @ np.hstack((np.eye(3), -C1[:, None]))
        P2 = self.K2 @ self.Rcommon @ np.hstack((np.eye(3), -C2[:, None]))
        return P1, P2

    def computeRectificationMaps(self, destDims=None, alpha=1):
        """Build undistort+rectify maps fitted into ``destDims``.

        Mirrors _rigs.py:491-541: computes the shared fitting affine, tracks
        the post-rectification intrinsics K1/K2, and builds the two sampling
        maps (on device via :func:`warp.init_undistort_rectify_map`).
        """
        from . import rectification as rect

        if destDims is None:
            destDims = self.res1

        Fit = rect.getFittingMatrix(
            self.intrinsic1, self.intrinsic2,
            self.rectHomography1, self.rectHomography2,
            self.res1, self.res2,
            self.distCoeffs1, self.distCoeffs2,
            destDims, alpha,
        )

        # All transforms applied after rectification — needed for 3D.
        # NOTE (deviation from the reference, _rigs.py:532-533): we normalize
        # by K[2,2]. The composition generally carries a non-unit overall
        # scale (~1%), which is harmless for map building (scale cancels in
        # inv(K R)) but biases the reference's Q-matrix depth, where fx is
        # read off K1 unnormalized.
        K1 = Fit @ self.rectHomography1 @ self.intrinsic1 @ self.Rcommon.T
        K2 = Fit @ self.rectHomography2 @ (self.intrinsic2 @ self.R) @ self.Rcommon.T
        self.K1 = K1 / K1[2, 2]
        self.K2 = K2 / K2[2, 2]

        # Object-space rotations for map building.
        R1 = self.Rcommon
        R2 = self.Rcommon @ self.R.T

        self.mapx1, self.mapy1 = warp.init_undistort_rectify_map(
            self.intrinsic1, self.distCoeffs1, R1, self.K1, destDims)
        self.mapx2, self.mapy2 = warp.init_undistort_rectify_map(
            self.intrinsic2, self.distCoeffs2, R2, self.K2, destDims)

    def rectifyImages(self, img1, img2, interpolation="linear"):
        """Undistort + rectify + fit an image pair (device gather)."""
        r1 = warp.remap(img1, self.mapx1, self.mapy1, interpolation=interpolation)
        r2 = warp.remap(img2, self.mapx2, self.mapy2, interpolation=interpolation)
        return np.asarray(r1), np.asarray(r2)

    def getQMatrix(self):
        """4x4 disparity-to-depth matrix for the rectified pair.

        Handles different cx between the two cameras and x-shear terms,
        exactly as the reference builds it (_rigs.py:589-625).
        """
        b = self.getBaseline()
        fx = self.K1[0, 0]
        fy = self.K2[1, 1]
        cx1 = self.K1[0, 2]
        cx2 = self.K2[0, 2]
        a1 = self.K1[0, 1]
        a2 = self.K2[0, 1]
        cy = self.K1[1, 2]

        Q = np.eye(4, dtype=np.float64)
        Q[0, 1] = -a1 / fy
        Q[0, 3] = a1 * cy / fy - cx1
        Q[1, 1] = fx / fy
        Q[1, 3] = -cy * fx / fy
        Q[2, 2] = 0
        Q[2, 3] = -fx
        Q[3, 1] = (a2 - a1) / (fy * b)
        Q[3, 2] = 1 / b
        Q[3, 3] = ((a1 - a2) * cy + (cx2 - cx1) * fy) / (fy * b)
        return Q

    def get3DPoints(self, disparityMap):
        """Reproject a dense disparity map to (H, W, 3) world points."""
        from .points import reprojectImageTo3D
        return reprojectImageTo3D(disparityMap, self.getQMatrix())


class StructuredLightRig(StereoRig):
    """Camera + projector rig with triangulation helpers.

    The projector is modeled as an inverse pinhole camera in position 2.
    Parity: _rigs.py:631-716.
    """

    def __init__(self, r):
        if not isinstance(r, StereoRig):
            raise ValueError("Invalid argument!")
        super().__init__(r.res1, r.res2, r.intrinsic1, r.intrinsic2,
                         r.distCoeffs1, r.distCoeffs2, r.R, r.T, r.F, r.E,
                         r.reprojectionError)
        self._computeMatrices()

    def _computeMatrices(self):
        from . import rectification as rect
        self.R1, self.R2, self.Rcommon = rect._lowLevelRectify(self)
        R_inv = np.eye(4)
        R_inv[:3, :3] = np.linalg.inv(self.Rcommon)
        self.R_inv = R_inv

    @classmethod
    def fromFile(cls, filepath):
        return cls(StereoRig.fromFile(filepath))

    def triangulate(self, camPoints, projPoints):
        """Triangulate camera-projector correspondences to 3D.

        ``camPoints`` must already be undistorted; projector points get the
        "inverse pinhole" re-distortion treatment (undistort with the
        projector's coefficients through its own intrinsics), then both sets
        are rectified to the baseline frame and intersected by disparity
        scaling — the reference's scheme at _rigs.py:654-700.

        Returns (N, 1, 3) world points in the camera frame.
        """
        pc = np.asarray(camPoints, np.float64).reshape(-1, 2)
        pp = np.asarray(projPoints, np.float64).reshape(-1, 2)

        pc = npgeom.perspective_transform(pc, self.R1)
        pc = np.hstack([pc, np.ones((pc.shape[0], 1))])

        pp = npgeom.undistort_points(
            pp, self.intrinsic2, self.distCoeffs2, P=self.intrinsic2)
        pp = npgeom.perspective_transform(pp, self.R2)

        disparity = np.abs(pp[:, [0]] - pc[:, [0]])
        # Zero disparity (point at infinity) yields inf coordinates, not a
        # crash — the reference divides unguarded (_rigs.py:692-693).
        with np.errstate(divide="ignore", invalid="ignore"):
            finalPoints = self.getBaseline() * (pc / disparity)

        # Undo the common orientation to return to camera-1 coordinates.
        finalPoints = npgeom.perspective_transform(
            finalPoints.reshape(-1, 1, 3), self.R_inv)
        return finalPoints

    def undistortCameraImage(self, imgObj):
        """Undistort the camera image (device warp)."""
        return np.asarray(
            warp.undistort_image(imgObj, self.intrinsic1, self.distCoeffs1))
