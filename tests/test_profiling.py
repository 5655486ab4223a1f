"""Observability: per-layer FLOPs walk (the reference's forward-hook table,
tracker3d_template.py:158-267, done via flax capture_intermediates)."""

import jax
import jax.numpy as jnp

from ptt_tpu.config import cfg_from_yaml_file
from ptt_tpu.nn import build_network
from ptt_tpu.utils.profiling import (
    count_parameters,
    format_layer_table,
    per_layer_flops,
)


def test_per_layer_walk_covers_every_parameter():
    cfg = cfg_from_yaml_file("tools/cfgs/kitti_models/ptt.yaml")
    model = build_network(cfg.MODEL)
    batch = {
        "search_points": jnp.zeros((2, 1024, 3)),
        "template_points": jnp.zeros((2, 512, 3)),
    }
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, train=False))(
        batch
    )
    rows = per_layer_flops(model, variables, batch)

    # every parameter belongs to exactly one Dense/BatchNorm row
    assert sum(i["params"] for _, i in rows) == count_parameters(
        variables["params"]
    )["total"]
    # all layers were actually executed (real captured shapes, nonzero flops)
    assert all(i["out_shape"] is not None for _, i in rows)
    assert all(i["flops"] > 0 for _, i in rows)
    # Siamese backbone layers are hit twice (search + template branch), like the
    # reference's hooks accumulating over calls
    sa_rows = [i for name, i in rows if name.startswith("backbone_3d/sa_stages")]
    assert sa_rows and all(i["calls"] == 2 for i in sa_rows)

    table = format_layer_table(rows)
    assert "TOTAL" in table and "backbone_3d/cov_final" in table
