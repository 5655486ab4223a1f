"""Host-side geometry primitives: quaternions, 3D boxes, point-cloud cropping.

Re-implements (from scratch, in pure numpy, no shapely/pyquaternion deps) the
geometric machinery of the reference's L0 layer:

  - ``Quaternion``            ~ pyquaternion.Quaternion (the subset the pipeline uses)
  - ``Box``                   ~ ptt/datasets/kitti/kitti_tracking_utils.py:68
  - ``crop_pc``               ~ kitti_tracking_utils.py:275 (AABB crop after scale/offset)
  - ``points_in_box_label``   ~ get_label_by_box, kitti_tracking_utils.py:238
  - ``crop_center_pc``        ~ kitti_tracking_utils.py:300 (canonical-frame crop + labels)
  - ``get_model``             ~ kitti_tracking_utils.py:219 (template fusion)
  - ``get_box_by_offset``     ~ kitti_tracking_utils.py:192 (box perturbation; offset[-1]
                                in DEGREES — the regression target convention)
  - ``regularize_pc``         ~ kitti_tracking_utils.py:342 (random resample to fixed N)
  - ``KalmanFiltering``       ~ kitti_tracking_utils.py:167 (Gaussian offset sampler)
  - ``rotate_points_along_z`` ~ ptt/utils/common_utils.py:164

Points are row-major ``(N, 3)`` float arrays throughout (the reference uses a 3xN
``PointCloud`` wrapper; the math is identical).  All functions are pure except the
RNG-consuming samplers, which take an explicit ``rng`` (np.random.Generator) or fall
back to the global numpy RNG for reference-compatible seeding.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field

import numpy as np

# ---------------------------------------------------------------------------
# Quaternion
# ---------------------------------------------------------------------------


class Quaternion:
    """Unit quaternion (w, x, y, z) with just the ops the tracking pipeline needs."""

    __slots__ = ("q",)

    def __init__(self, elements=None, *, axis=None, angle=None, radians=None, matrix=None):
        if matrix is not None:
            self.q = _quat_from_matrix(np.asarray(matrix, dtype=np.float64))
        elif axis is not None:
            theta = float(angle if angle is not None else radians)
            ax = np.asarray(axis, dtype=np.float64)
            n = np.linalg.norm(ax)
            if n == 0:
                raise ValueError("zero axis")
            ax = ax / n
            half = theta / 2.0
            self.q = np.concatenate(([np.cos(half)], np.sin(half) * ax))
        elif elements is not None:
            self.q = np.asarray(elements, dtype=np.float64).reshape(4)
        else:
            self.q = np.array([1.0, 0.0, 0.0, 0.0])

    # -- accessors ---------------------------------------------------------
    @property
    def elements(self):
        return self.q

    @property
    def w(self):
        return self.q[0]

    @property
    def axis(self):
        v = self.q[1:]
        n = np.linalg.norm(v)
        if n < 1e-12:
            return np.array([0.0, 0.0, 1.0])
        return v / n

    @property
    def radians(self):
        # angle in [0, 2*pi)
        n = np.linalg.norm(self.q[1:])
        return 2.0 * np.arctan2(n, self.q[0])

    @property
    def degrees(self):
        return np.degrees(self.radians)

    @property
    def rotation_matrix(self):
        w, x, y, z = self.q / np.linalg.norm(self.q)
        return np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )

    @property
    def inverse(self):
        conj = self.q * np.array([1.0, -1.0, -1.0, -1.0])
        return Quaternion(conj / np.dot(self.q, self.q))

    def __mul__(self, other: "Quaternion") -> "Quaternion":
        w1, x1, y1, z1 = self.q
        w2, x2, y2, z2 = other.q
        return Quaternion(
            [
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            ]
        )

    def rotate(self, v):
        return self.rotation_matrix @ np.asarray(v, dtype=np.float64)

    def __repr__(self):
        return f"Quaternion({self.q.tolist()})"


def _quat_from_matrix(m: np.ndarray) -> np.ndarray:
    """Shepperd's method; accepts a 3x3 (or 4x4 homogeneous) rotation matrix."""
    m = m[:3, :3]
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        w = (m[2, 1] - m[1, 2]) / s
        x = 0.25 * s
        y = (m[0, 1] + m[1, 0]) / s
        z = (m[0, 2] + m[2, 0]) / s
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        w = (m[0, 2] - m[2, 0]) / s
        x = (m[0, 1] + m[1, 0]) / s
        y = 0.25 * s
        z = (m[1, 2] + m[2, 1]) / s
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        w = (m[1, 0] - m[0, 1]) / s
        x = (m[0, 2] + m[2, 0]) / s
        y = (m[1, 2] + m[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    if q[0] < 0:
        q = -q
    return q / np.linalg.norm(q)


# ---------------------------------------------------------------------------
# Box
# ---------------------------------------------------------------------------


@dataclass
class Box:
    """3D oriented bounding box.

    ``center``: (3,) box center; ``wlh``: (width, length, height);
    ``orientation``: Quaternion.  Corner convention matches the reference
    (x forward, y left, z up; kitti_tracking_utils.py:132-155).
    """

    center: np.ndarray
    wlh: np.ndarray
    orientation: Quaternion
    label: float = np.nan
    score: float = np.nan
    velocity: np.ndarray = field(default_factory=lambda: np.full(3, np.nan))
    name: str | None = None

    def __post_init__(self):
        self.center = np.array(self.center, dtype=np.float64).reshape(3)
        self.wlh = np.array(self.wlh, dtype=np.float64).reshape(3)

    def copy(self) -> "Box":
        return Box(
            self.center.copy(),
            self.wlh.copy(),
            Quaternion(self.orientation.elements.copy()),
            label=self.label,
            score=self.score,
            velocity=np.array(self.velocity),
            name=self.name,
        )

    @property
    def rotation_matrix(self) -> np.ndarray:
        return self.orientation.rotation_matrix

    def translate(self, x):
        self.center = self.center + np.asarray(x, dtype=np.float64)
        return self

    def rotate(self, quaternion: Quaternion):
        self.center = quaternion.rotation_matrix @ self.center
        self.orientation = quaternion * self.orientation
        self.velocity = quaternion.rotation_matrix @ self.velocity
        return self

    def corners(self, wlh_factor: float = 1.0) -> np.ndarray:
        """(3, 8) corner coordinates."""
        w, l, h = self.wlh * wlh_factor
        x_c = (l / 2) * np.array([1, 1, 1, 1, -1, -1, -1, -1], dtype=np.float64)
        y_c = (w / 2) * np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.float64)
        z_c = (h / 2) * np.array([1, 1, -1, -1, 1, 1, -1, -1], dtype=np.float64)
        corners = self.orientation.rotation_matrix @ np.vstack((x_c, y_c, z_c))
        return corners + self.center.reshape(3, 1)

    def bottom_corners(self) -> np.ndarray:
        """(3, 4) corners of the bottom face (z-min), same ordering as reference."""
        return self.corners()[:, [2, 3, 7, 6]]

    def __eq__(self, other):
        return (
            np.allclose(self.center, other.center)
            and np.allclose(self.wlh, other.wlh)
            and np.allclose(self.orientation.elements, other.orientation.elements)
        )

    def encode(self) -> list:
        """Flatten to a 16-element list [center(3), wlh(3), quat(4), label,
        score, velocity(3), name] (reference Box.encode,
        kitti_tracking_utils.py:105-108)."""
        return (
            self.center.tolist()
            + self.wlh.tolist()
            + self.orientation.elements.tolist()
            + [self.label, self.score]
            + np.asarray(self.velocity, dtype=np.float64).tolist()
            + [self.name]
        )

    @classmethod
    def decode(cls, data) -> "Box":
        """Inverse of :meth:`encode` (reference Box.decode,
        kitti_tracking_utils.py:110-112)."""
        return cls(
            data[0:3],
            data[3:6],
            Quaternion(np.asarray(data[6:10], dtype=np.float64)),
            label=data[10],
            score=data[11],
            velocity=np.asarray(data[12:15], dtype=np.float64),
            name=data[15],
        )


# ---------------------------------------------------------------------------
# Point transforms
# ---------------------------------------------------------------------------


def transform_points(points: np.ndarray, rot: np.ndarray | None = None, trans=None) -> np.ndarray:
    """Apply ``p' = R p + t`` to (N, 3) points (row-vector convention)."""
    out = np.asarray(points, dtype=np.float64)
    if rot is not None:
        out = out @ np.asarray(rot).T
    if trans is not None:
        out = out + np.asarray(trans, dtype=np.float64)
    return out


def rotate_points_along_z(points: np.ndarray, angle: float) -> np.ndarray:
    """Rotate (N, 3+C) points around +z by ``angle`` radians (x => y positive)."""
    points = np.asarray(points)
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])
    out = points.copy()
    out[:, :3] = points[:, :3] @ rot
    return out


def limit_period(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period


# ---------------------------------------------------------------------------
# Crops / labels (reference: kitti_tracking_utils.py:192-367)
# ---------------------------------------------------------------------------


def _aabb_mask(points: np.ndarray, box: Box, offset: float = 0.0, scale: float = 1.0) -> np.ndarray:
    """Inside-mask of the axis-aligned bounds of ``box`` scaled/padded (open interval,
    matching the strict </> comparisons in the reference crop_pc)."""
    b = box.copy()
    b.wlh = b.wlh * scale
    corners = b.corners()
    maxi = corners.max(axis=1) + offset
    mini = corners.min(axis=1) - offset
    return np.all((points[:, :3] > mini) & (points[:, :3] < maxi), axis=1)


def crop_pc(points: np.ndarray, box: Box, label=None, offset: float = 0.0, scale: float = 1.0):
    """AABB crop around a (scaled, padded) box. Returns points (and label) subset."""
    mask = _aabb_mask(points, box, offset=offset, scale=scale)
    new_points = points[mask]
    if label is None:
        return new_points
    return new_points, label[mask]


def points_in_box_label(points: np.ndarray, box: Box, offset: float = 0.0, scale: float = 1.0) -> np.ndarray:
    """Binary in-box labels computed in the box's canonical frame
    (reference get_label_by_box, kitti_tracking_utils.py:238)."""
    rot = box.rotation_matrix.T
    local = transform_points(points[:, :3], trans=-box.center)
    local = local @ rot.T

    b = box.copy()
    b.translate(-box.center)
    b.rotate(Quaternion(matrix=rot))
    b.wlh = b.wlh * scale
    corners = b.corners()
    maxi = corners.max(axis=1) + offset
    mini = corners.min(axis=1) - offset
    inside = np.all((local > mini) & (local < maxi), axis=1)
    return inside.astype(np.float64)


def crop_center_pc(
    points: np.ndarray,
    sample_box: Box,
    gt_box: Box | None = None,
    sample_offsets=None,
    offset: float = 0.0,
    scale: float = 1.0,
    refine_box: bool = True,
    normalize: bool = False,
):
    """Crop the search region around ``sample_box`` and express it in the box's
    canonical frame; with a GT box, also return per-point cls labels and the 4-dof
    regression target [cx, cy, cz, -theta_offset_deg].

    Mirrors reference crop_center_pc (kitti_tracking_utils.py:300-339): a loose AABB
    pre-crop (offset*2, scale*4), rigid transform into the sample box frame, then a
    tight crop — with the reference's ``gt.wlh[1]*0.6`` extra slack whenever gt_box
    is given, which is BOTH the train path and the reference evaluator's search
    crop (prepare_search passes gt_box, eval_tracking_utils.py:164-169).
    ``normalize`` divides the canonical points axis-wise by the sample box's
    (l, w, h) (reference PointCloud.normalize + the ``normalize=`` flag,
    kitti_tracking_utils.py:63-65,337-338; off in every shipped config).
    """
    pts = crop_pc(points, sample_box, offset=2 * offset, scale=4 * scale)
    box = sample_box.copy()

    label = reg = None
    if gt_box is not None:
        label = points_in_box_label(
            pts,
            gt_box,
            offset=offset if refine_box else 0.0,
            scale=scale if refine_box else 1.0,
        )

    rot = box.rotation_matrix.T
    trans = -box.center
    pts = transform_points(pts, trans=trans)
    pts = pts @ rot.T
    box.translate(trans)
    box.rotate(Quaternion(matrix=rot))

    if gt_box is not None:
        pts, label = crop_pc(pts, box, label, offset=offset + gt_box.wlh[1] * 0.6, scale=scale)
        gt_local = gt_box.copy()
        gt_local.translate(trans)
        gt_local.rotate(Quaternion(matrix=rot))
        if sample_offsets is not None:
            reg = np.array(
                [gt_local.center[0], gt_local.center[1], gt_local.center[2], -sample_offsets[-1]]
            )
        if normalize:
            pts = normalize_points(pts, sample_box.wlh)
        return pts, label, reg
    else:
        pts = crop_pc(pts, box, offset=offset, scale=scale)
        if normalize:
            pts = normalize_points(pts, sample_box.wlh)
        return pts


def normalize_points(points: np.ndarray, wlh) -> np.ndarray:
    """Divide (N, 3) points axis-wise by the box extent reordered to the
    canonical frame's (x=l, y=w, z=h) — reference PointCloud.normalize
    (kitti_tracking_utils.py:63-65: normalizer = [wlh[1], wlh[0], wlh[2]])."""
    wlh = np.asarray(wlh, dtype=np.float64).reshape(3)
    return np.asarray(points, dtype=np.float64) / np.array([wlh[1], wlh[0], wlh[2]])


def get_model(pcs, boxes, offset: float = 0.0, scale: float = 1.0):
    """Fuse multiple frame crops (each in its own box canonical frame) into one
    template cloud (reference get_model, kitti_tracking_utils.py:219)."""
    if len(pcs) == 0:
        return np.zeros((0, 3))
    parts = []
    for pc, box in zip(pcs, boxes):
        cropped = crop_center_pc(pc, box, offset=offset, scale=scale)
        if cropped.shape[0] > 0:
            parts.append(cropped)
    if not parts:
        return np.zeros((0, 3))
    return np.concatenate(parts, axis=0)


def get_box_by_offset(box: Box, offset, use_z: bool = False, rng: np.random.Generator | None = None) -> Box:
    """Perturb ``box`` by (x, y, z[, theta]) in its canonical frame.

    ``offset[-1]`` is an angle in DEGREES (reference kitti_tracking_utils.py:192-216;
    this degree convention is also the network's theta regression target). Offsets
    larger than the box extent are resampled uniform(-1, 1) like the reference.
    """
    offset = np.array(offset, dtype=np.float64)
    rot_quat = Quaternion(matrix=box.rotation_matrix)
    trans = np.array(box.center)

    new_box = box.copy()
    new_box.translate(-trans)
    new_box.rotate(rot_quat.inverse)

    new_box.rotate(Quaternion(axis=[0, 0, 1], angle=np.deg2rad(offset[-1])))
    _uniform = rng.uniform if rng is not None else np.random.uniform
    if offset[0] > new_box.wlh[0]:
        offset[0] = _uniform(-1, 1)
    if offset[1] > min(new_box.wlh[1], 2):
        offset[1] = _uniform(-1, 1)

    new_box.translate(np.array([offset[0], offset[1], offset[2] if use_z else 0.0]))
    new_box.rotate(rot_quat)
    new_box.translate(trans)
    return new_box


def regularize_pc(
    points: np.ndarray,
    input_size: int,
    label=None,
    reg=None,
    istrain: bool = True,
    rng: np.random.Generator | None = None,
    seed_for_test: int = 1,
):
    """Random-resample ``points`` (N, C) to exactly ``input_size`` rows.

    Matches reference regularize_pc (kitti_tracking_utils.py:342-367): with >2 points,
    uniform random indices with replacement; on the test path the RNG is reseeded to a
    fixed value so eval is deterministic; with <=2 points, an all-zeros cloud.
    """
    points = np.asarray(points, dtype=np.float32)
    n, c = points.shape
    if input_size <= 0:
        return points if label is None else (points, label, reg)

    if n > 2:
        if n != input_size:
            if rng is None:
                if not istrain:
                    np.random.seed(seed_for_test)
                idx = np.random.randint(0, n, size=input_size)
            else:
                idx = rng.integers(0, n, size=input_size)
            points = points[idx]
            if label is not None:
                label = label[idx]
    else:
        points = np.zeros((input_size, c), dtype=np.float32)
        if label is not None:
            label = np.zeros(input_size)
    return points if label is None else (points, label, reg)


class KalmanFiltering:
    """Gaussian offset sampler with score-weighted adaptation
    (reference kitti_tracking_utils.py:167-190)."""

    def __init__(self, bnd=None, rng: np.random.Generator | None = None):
        self.bnd = [1, 1, 10] if bnd is None else bnd
        self.rng = rng
        self.reset()

    def sample(self, n=10):
        if self.rng is not None:
            return self.rng.multivariate_normal(self.mean, self.cov, size=n)
        return np.random.multivariate_normal(self.mean, self.cov, size=n)

    def addData(self, data, score):
        score = score.clip(min=1e-5)
        self.data = np.concatenate((self.data, data))
        self.score = np.concatenate((self.score, score))
        self.mean = np.average(self.data, weights=self.score, axis=0)
        self.cov = np.cov(self.data.T, ddof=0, aweights=self.score)

    def reset(self):
        self.mean = np.zeros(len(self.bnd))
        self.cov = np.diag(self.bnd)
        self.data = np.zeros((0, len(self.bnd)))
        self.score = np.array([])
