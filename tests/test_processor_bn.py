"""Tests for the opt-in data processor queue and the BN momentum schedule."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptt_tpu.data.processor import DataProcessor
from ptt_tpu.train.bn_momentum import (
    MODEL_BN_MOMENTUM,
    bn_momentum_for_epoch,
    rescale_batch_stats,
)


def make_item(rng, n=300):
    return {
        "search_points": rng.standard_normal((n, 3)).astype(np.float32) * 10,
        "template_points": rng.standard_normal((n // 2, 3)).astype(np.float32),
        "cls_label": (rng.random(n) > 0.5).astype(np.float32),
    }


def test_shuffle_points_permutes_and_keeps_labels_aligned(rng):
    item = make_item(rng)
    pts_before = item["search_points"].copy()
    lab_before = item["cls_label"].copy()
    proc = DataProcessor(
        [{"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}}],
        training=True,
    )
    out = proc.forward(dict(item), rng=np.random.default_rng(0))
    assert not np.array_equal(out["search_points"], pts_before)
    # the (point, label) pairing must survive the permutation
    key = {tuple(np.round(p, 5)): l for p, l in zip(pts_before, lab_before)}
    for p, l in zip(out["search_points"], out["cls_label"]):
        assert key[tuple(np.round(p, 5))] == l


def test_shuffle_disabled_in_test_mode(rng):
    item = make_item(rng)
    proc = DataProcessor(
        [{"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}}],
        training=False,
    )
    out = proc.forward(dict(item), rng=np.random.default_rng(0))
    np.testing.assert_array_equal(out["search_points"], item["search_points"])


def test_sample_points_near_far(rng):
    item = make_item(rng, n=500)
    # a few points beyond 40 m (< the sample budget) so the far-preserving branch
    # is exercised; the bulk stays near (sigma 10 -> norm ~17)
    item["search_points"][:30] *= 20
    proc = DataProcessor(
        [{"NAME": "sample_points", "NUM_POINTS": {"train": 256, "test": -1}}],
        training=True,
    )
    out = proc.forward(dict(item), rng=np.random.default_rng(0))
    assert out["search_points"].shape == (256, 3)
    assert out["cls_label"].shape == (256,)
    # far points (sparse) are all kept
    n_far = int((np.linalg.norm(out["search_points"], axis=1) >= 40).sum())
    n_far_in = int((np.linalg.norm(item["search_points"], axis=1) >= 40).sum())
    assert n_far == n_far_in


def test_sample_points_upsamples(rng):
    item = make_item(rng, n=100)
    proc = DataProcessor(
        [{"NAME": "sample_points", "NUM_POINTS": {"train": 256, "test": -1}}],
        training=True,
    )
    out = proc.forward(dict(item), rng=np.random.default_rng(0))
    assert out["search_points"].shape == (256, 3)


def test_bn_momentum_schedule_values():
    assert bn_momentum_for_epoch(0) == pytest.approx(0.5)
    assert bn_momentum_for_epoch(19) == pytest.approx(0.5)
    assert bn_momentum_for_epoch(20) == pytest.approx(0.25)
    assert bn_momentum_for_epoch(200) == pytest.approx(0.01)  # clipped


def test_rescale_batch_stats_exact(rng):
    """The EMA correction must reproduce a step taken directly at the target
    momentum."""
    old = {"bn": {"mean": jnp.asarray(rng.standard_normal(8), jnp.float32)}}
    obs = jnp.asarray(rng.standard_normal(8), jnp.float32)
    m0 = MODEL_BN_MOMENTUM
    new_model = {"bn": {"mean": m0 * old["bn"]["mean"] + (1 - m0) * obs}}
    target = 0.75
    want = target * old["bn"]["mean"] + (1 - target) * obs
    got = rescale_batch_stats(old, new_model, target)
    np.testing.assert_allclose(np.asarray(got["bn"]["mean"]), np.asarray(want), rtol=1e-5)
