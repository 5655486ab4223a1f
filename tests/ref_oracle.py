"""Test-only loader for the reference PyTorch implementation (read-only oracle).

Instantiates the reference model on CPU by stubbing its CUDA/visualization-only
dependencies (the pointnet2_ops extension is only *called* in forward paths we never
run here). Used to (a) enumerate the torch state_dict for converter coverage and
(b) run the pure-torch submodules (similarity, heads, transformer) as numeric
oracles against the flax modules with converted weights.
"""

import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE_ROOT.exists()


_loaded = {}


def _install_functional_ext(ext):
    """Populate the ``pointnet2_ops._ext`` stand-in with working CPU kernels.

    gather/group are exact torch gathers; FPS and ball-query call this repo's C++
    oracles (bit-exact to the jnp/Pallas kernels the flax model uses — see
    tests/test_native.py), so the reference's FULL forward becomes runnable on CPU
    and comparable against the flax forward with converted weights
    (reference call surface: ptt/models/backbones_3d/pointnet2/pointnet2_utils.py:27–294).

    Functions are set on the (possibly pre-existing) module object in place so
    reference modules that already bound ``_ext`` see them too.
    """
    if getattr(ext, "_ptt_functional", False):
        return
    import numpy as np
    import torch

    from ptt_tpu import native

    if not native.available():  # pragma: no cover - toolchain always present in CI
        return

    def furthest_point_sampling(xyz, npoint):
        idx = native.fps(xyz.detach().numpy(), int(npoint))
        return torch.from_numpy(np.ascontiguousarray(idx)).int()

    def furthest_point_sampling_with_dist(dist, npoint):
        idx = native.fps_with_dist(dist.detach().numpy(), int(npoint))
        return torch.from_numpy(np.ascontiguousarray(idx)).int()

    def gather_points(features, idx):
        # .clone(): these run inside the reference's custom autograd Functions,
        # whose outputs get modified in place (pointnet2_utils.py:352) — torch
        # forbids that on view outputs of a custom Function under autograd
        b, c, _ = features.shape
        ii = idx.long().unsqueeze(1).expand(b, c, idx.shape[1])
        return torch.gather(features, 2, ii).clone()

    def ball_query(new_xyz, xyz, radius, nsample):
        idx = native.ball_query(
            xyz.detach().numpy(), new_xyz.detach().numpy(), float(radius), int(nsample)
        )
        return torch.from_numpy(np.ascontiguousarray(idx)).int()

    def group_points(features, idx):
        b, c, _ = features.shape
        npnt, ns = idx.shape[1], idx.shape[2]
        flat = idx.long().reshape(b, 1, npnt * ns).expand(b, c, npnt * ns)
        return torch.gather(features, 2, flat).reshape(b, c, npnt, ns).clone()

    def gather_points_grad(grad_out, idx, N):
        # scatter-add (duplicate indices accumulate) — the CUDA kernel's exact
        # semantics and what ops.gather_points' custom vjp does
        b, c, npnt = grad_out.shape
        grad = torch.zeros(b, c, N, dtype=grad_out.dtype)
        ii = idx.long().unsqueeze(1).expand(b, c, npnt)
        return grad.scatter_add_(2, ii, grad_out)

    def group_points_grad(grad_out, idx, N):
        b, c, npnt, ns = grad_out.shape
        grad = torch.zeros(b, c, N, dtype=grad_out.dtype)
        flat = idx.long().reshape(b, 1, npnt * ns).expand(b, c, npnt * ns)
        return grad.scatter_add_(2, flat, grad_out.reshape(b, c, npnt * ns))

    ext.furthest_point_sampling = furthest_point_sampling
    ext.furthest_point_sampling_with_dist = furthest_point_sampling_with_dist
    ext.gather_points = gather_points
    ext.gather_points_grad = gather_points_grad
    ext.ball_query = ball_query
    ext.group_points = group_points
    ext.group_points_grad = group_points_grad
    ext._ptt_functional = True


def install_geometry_stubs():
    """Functional stand-ins for the reference's geometry deps so its EVAL STACK
    (kitti_tracking_utils / eval_tracking_utils / eval_tracking_metrics) runs on
    this machine: ``pyquaternion.Quaternion`` -> this repo's geometry.Quaternion
    (same API: matrix=/axis=/angle= ctor, .rotation_matrix, .inverse property,
    __mul__), ``shapely.geometry.Polygon`` -> a minimal convex polygon backed by
    eval/metrics' own clipper (.area, .intersection, .union — all
    estimateOverlap touches, eval_tracking_metrics.py:44-74).

    Attributes are set on possibly pre-existing stub modules in place, so this
    works whether or not load_reference_model already ran."""
    import numpy as np

    from ptt_tpu.core.geometry import Quaternion
    from ptt_tpu.eval.metrics import polygon_area, polygon_intersection_area

    pyq = sys.modules.setdefault("pyquaternion", types.ModuleType("pyquaternion"))
    pyq.Quaternion = Quaternion

    class _Polygon:
        def __init__(self, pts):
            self.pts = np.asarray(pts, np.float64)

        @property
        def area(self):
            return polygon_area(self.pts)

        def intersection(self, other):
            return _Region(polygon_intersection_area(self.pts, other.pts))

        def union(self, other):
            inter = polygon_intersection_area(self.pts, other.pts)
            return _Region(self.area + other.area - inter)

    class _Region:
        def __init__(self, area):
            self.area = area

    shp = sys.modules.setdefault("shapely", types.ModuleType("shapely"))
    geom = sys.modules.setdefault("shapely.geometry", types.ModuleType("shapely.geometry"))
    geom.Polygon = _Polygon
    shp.geometry = geom

    # the reference dataset package __init__ pulls these at import time; the
    # eval stack never calls them on the fabricated in-memory tracklets
    ski = sys.modules.setdefault("skimage", types.ModuleType("skimage"))
    ski.io = sys.modules.setdefault("skimage.io", types.ModuleType("skimage.io"))
    ipdb = sys.modules.setdefault("ipdb", types.ModuleType("ipdb"))
    ipdb.set_trace = lambda *a, **k: None
    nus = sys.modules.setdefault("nuscenes", types.ModuleType("nuscenes"))
    nus.NuScenes = type("NuScenes", (), {})
    for sub, names in (
        ("nuscenes.nuscenes", ("NuScenes",)),
        ("nuscenes.utils", ()),
        ("nuscenes.utils.data_classes", ("LidarPointCloud", "Box")),
    ):
        mod = sys.modules.setdefault(sub, types.ModuleType(sub))
        for n in names:
            setattr(mod, n, type(n, (), {}))
        setattr(
            sys.modules[sub.rsplit(".", 1)[0]] if "." in sub else nus,
            sub.rsplit(".", 1)[-1],
            mod,
        )


def reference_forward_runnable() -> bool:
    """True when the reference's full PTT.forward can execute on CPU here."""
    from ptt_tpu import native

    return reference_available() and native.available()


def load_reference_model(cfg_name="kitti_models/ptt.yaml", seed=0, cfg_mutator=None,
                         cache_key=None):
    """Returns (torch_model.eval() with randomized weights/BN stats, ref cfg).
    ``cfg_mutator(ref_cfg)`` can modify the config before the model is built
    (e.g. switch transformer variants)."""
    key = (cfg_name, seed, cache_key)
    if key in _loaded:
        return _loaded[key]

    import numpy as np
    import torch

    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self

    if "easydict" not in sys.modules or not hasattr(sys.modules.get("easydict"), "EasyDict"):
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __init__(self, d=None):
                for k, v in (d or {}).items():
                    self[k] = v

            def __setitem__(self, k, v):
                if isinstance(v, dict) and not isinstance(v, EasyDict):
                    v = EasyDict(v)
                if isinstance(v, list):
                    v = [EasyDict(x) if isinstance(x, dict) else x for x in v]
                super().__setitem__(k, v)
                super().__setattr__(k, v)

            def __setattr__(self, k, v):
                self[k] = v

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed

    # stub ONLY the reference deps that are genuinely absent — replacing an
    # installed package (e.g. pandas) in sys.modules would break the rest of the
    # test process
    import importlib.util

    for name in ["pointnet2_ops", "tensorboardX", "mayavi", "shapely",
                 "pyquaternion", "pandas", "skimage", "nuscenes", "tqdm", "ipdb"]:
        if name not in sys.modules and importlib.util.find_spec(name) is None:
            sys.modules[name] = types.ModuleType(name)
    ext = sys.modules.setdefault("pointnet2_ops._ext", types.ModuleType("pointnet2_ops._ext"))
    _install_functional_ext(ext)
    thop = types.ModuleType("thop")
    thop.profile = lambda *a, **k: (0, 0)
    thop.clever_format = lambda *a, **k: ""
    sys.modules["thop"] = thop

    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    from ptt.config import cfg_from_yaml_file
    from easydict import EasyDict as ED

    ref_cfg = ED()
    cfg_from_yaml_file(str(REFERENCE_ROOT / "tools/cfgs" / cfg_name), ref_cfg)
    if cfg_mutator is not None:
        cfg_mutator(ref_cfg)
    from ptt.models import build_network

    class _PFE:
        num_point_features = 3

    class _DS:
        class_names = ["Car"]
        training = False
        grid_size = None
        point_cloud_range = None
        voxel_size = None
        point_feature_encoder = _PFE()

    model = build_network(model_cfg=ref_cfg.MODEL, num_class=1, dataset=_DS())

    # randomize every tensor (weights AND BN running stats) so parity tests are
    # nontrivial — a fresh model has mean=0/var=1 stats that would mask layout bugs
    rng = np.random.default_rng(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or "loss_func" in k:
            continue  # keep config-derived buffers (pos_weight) intact
        arr = rng.standard_normal(tuple(v.shape)) * 0.1
        if k.endswith("running_var"):
            arr = np.abs(arr) + 0.5
        sd[k] = torch.from_numpy(arr.astype(np.float32)).reshape(v.shape)
    model.load_state_dict(sd)
    model.eval()
    _loaded[key] = (model, ref_cfg)
    return model, ref_cfg
