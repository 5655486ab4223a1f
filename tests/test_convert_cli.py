"""End-to-end checkpoint conversion: reference .pth -> convert CLI -> orbax dir ->
loaded back by the framework's checkpoint loader with identical tensors."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.ref_oracle import load_reference_model, reference_available

pytestmark = [
    pytest.mark.slow,  # CLI subprocesses
    pytest.mark.skipif(
        not reference_available(), reason="reference tree not mounted"
    ),
]

REPO = Path(__file__).resolve().parent.parent


def test_convert_cli_roundtrip(tmp_path, monkeypatch):
    import torch
    import jax
    import jax.numpy as jnp

    torch_model, _ = load_reference_model()
    pth = tmp_path / "ref_ckpt.pth"
    torch.save(
        {"model_state": torch_model.state_dict(), "epoch": 42, "it": 1000}, pth
    )

    out = tmp_path / "converted"
    monkeypatch.setattr(sys, "argv", [
        "convert_checkpoint.py",
        "--cfg_file", "tools/cfgs/kitti_models/ptt.yaml",
        "--torch_ckpt", str(pth),
        "--out", str(out),
    ])
    spec = importlib.util.spec_from_file_location(
        "convert_cli", REPO / "tools" / "convert_checkpoint.py"
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    cli.main()
    assert out.exists()

    # load back through the framework loader and spot-check a tensor
    from ptt_tpu.config import cfg_from_yaml_file
    from ptt_tpu.nn import build_network
    from ptt_tpu.train import checkpoint

    cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")
    model = build_network(cfg.MODEL)
    batch = {
        "search_points": jnp.zeros((1, 1024, 3)),
        "template_points": jnp.zeros((1, 512, 3)),
    }
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, train=False))(batch)
    params, batch_stats = checkpoint.load_params_from_file(
        checkpoint.resolve_checkpoint_path(out), variables["params"], variables["batch_stats"]
    )
    ref_w = torch_model.backbone_3d.cov_final.weight.detach().numpy()[:, :, 0].T
    np.testing.assert_allclose(
        np.asarray(params["backbone_3d"]["cov_final"]["kernel"]), ref_w, atol=1e-6
    )
