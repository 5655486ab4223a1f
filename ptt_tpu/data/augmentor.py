"""Train-time augmentation queue (reference augmentor/data_augmentor.py:15-56,
augmentor_utils.py): world flips, global rotation, global scaling applied jointly to
search points, template points, and the regression label.

Only valid in lidar coordinates (reference kitti_dataset_tracking.py:55 note).

Angle-unit note: the reference mixes radians into the degree-valued theta channel of
``reg_label`` in flip-y and rotation (augmentor_utils.py:41,65 — a latent bug that is
moot because no shipped config enables the augmentor).  Here the theta channel is
consistently DEGREES, matching the training target convention.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..core.geometry import rotate_points_along_z


def _wrap_theta_deg(theta):
    """Wrap the degree-valued theta target to (-180, 180] — a flip otherwise
    produces targets like -184 deg that smooth-L1 would chase the long way round."""
    return -((-theta + 180.0) % 360.0 - 180.0)


def random_flip_along_x(data_dict, rng):
    if rng.random() < 0.5:
        data_dict["search_points"][:, 1] = -data_dict["search_points"][:, 1]
        data_dict["template_points"][:, 1] = -data_dict["template_points"][:, 1]
        data_dict["reg_label"][1] = -data_dict["reg_label"][1]
        data_dict["reg_label"][-1] = _wrap_theta_deg(-data_dict["reg_label"][-1])
    return data_dict


def random_flip_along_y(data_dict, rng):
    if rng.random() < 0.5:
        data_dict["search_points"][:, 0] = -data_dict["search_points"][:, 0]
        data_dict["template_points"][:, 0] = -data_dict["template_points"][:, 0]
        data_dict["reg_label"][0] = -data_dict["reg_label"][0]
        data_dict["reg_label"][-1] = _wrap_theta_deg(-(data_dict["reg_label"][-1] + 180.0))
    return data_dict


def global_rotation(data_dict, rot_range, rng):
    angle = rng.uniform(rot_range[0], rot_range[1])
    data_dict["search_points"] = rotate_points_along_z(data_dict["search_points"], angle)
    data_dict["template_points"] = rotate_points_along_z(data_dict["template_points"], angle)
    data_dict["reg_label"][0:3] = rotate_points_along_z(
        data_dict["reg_label"][None, 0:3], angle
    )[0]
    data_dict["reg_label"][-1] = _wrap_theta_deg(data_dict["reg_label"][-1] + np.degrees(angle))
    return data_dict


def global_scaling(data_dict, scale_range, rng):
    if scale_range[1] - scale_range[0] < 1e-3:
        return data_dict
    s = rng.uniform(scale_range[0], scale_range[1])
    data_dict["search_points"][:, :3] *= s
    data_dict["template_points"][:, :3] *= s
    data_dict["reg_label"][:3] *= s
    return data_dict


class DataAugmentor:
    def __init__(self, augmentor_configs, rng: np.random.Generator | None = None):
        self.rng = rng or np.random.default_rng()
        cfg_list = (
            augmentor_configs
            if isinstance(augmentor_configs, list)
            else augmentor_configs["AUG_CONFIG_LIST"]
        )
        self.queue = []
        for cur in cfg_list:
            name = cur["NAME"]
            if name == "random_world_flip":
                for axis in cur["ALONG_AXIS_LIST"]:
                    assert axis in ("x", "y")
                    fn = {"x": random_flip_along_x, "y": random_flip_along_y}[axis]
                    self.queue.append(fn)
            elif name == "random_world_rotation":
                rot = cur["WORLD_ROT_ANGLE"]
                if not isinstance(rot, list):
                    rot = [-rot, rot]
                self.queue.append(partial(global_rotation, rot_range=rot))
            elif name == "random_world_scaling":
                self.queue.append(partial(global_scaling, scale_range=cur["WORLD_SCALE_RANGE"]))
            else:
                raise NotImplementedError(name)

    def forward(self, data_dict, rng=None):
        rng = rng or self.rng
        for fn in self.queue:
            data_dict = fn(data_dict, rng=rng)
        return data_dict
