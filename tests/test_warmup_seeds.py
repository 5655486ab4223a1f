"""The shipped-warm-path mechanism: bench.setup_cache must seed .jax_cache from
the committed cache_seeds/ executables (the round-3 fix for the 993-s cold
start), without clobbering newer entries."""

import importlib
import os


def test_setup_cache_seeds_jax_cache(tmp_path, monkeypatch):
    import bench
    import jax

    # restore the global cache-dir config afterwards (tmp_path is deleted; a
    # dangling cache dir would make later tests' compiles log write failures)
    prev = jax.config.jax_compilation_cache_dir

    repo = tmp_path / "repo"
    (repo / "cache_seeds").mkdir(parents=True)
    (repo / "cache_seeds" / "jit_foo-abc-cache").write_bytes(b"exe1")
    (repo / "cache_seeds" / "jit_bar-def-cache").write_bytes(b"exe2")
    # pre-existing newer entry must not be overwritten
    (repo / ".jax_cache").mkdir()
    (repo / ".jax_cache" / "jit_foo-abc-cache").write_bytes(b"newer")

    monkeypatch.setattr(bench, "REPO_ROOT", str(repo))
    try:
        cache_dir = bench.setup_cache()

        assert cache_dir == str(repo / ".jax_cache")
        assert (repo / ".jax_cache" / "jit_bar-def-cache").read_bytes() == b"exe2"
        assert (repo / ".jax_cache" / "jit_foo-abc-cache").read_bytes() == b"newer"
        assert jax.config.jax_compilation_cache_dir == cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_committed_seeds_exist_and_cover_the_bench():
    """The repo must ship a bench-keyed tracker executable (cache keys are
    entry-point-process-sensitive — docs/PERFORMANCE.md 'Compile times')."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seeds = os.path.join(repo, "cache_seeds")
    names = os.listdir(seeds)
    assert any(n.startswith("jit_track_batched") for n in names), names
    assert any(n.startswith("jit__lambda") for n in names), names  # model init
    # each entry is a real serialized executable, not a placeholder. The
    # tracker-scan / model-init programs serialize to >100 KB; auxiliary
    # entries (e.g. a jit_broadcast_in_dim the warmup flow happens to compile)
    # are legitimately small, so they only need to be non-trivial.
    for n in names:
        size = os.path.getsize(os.path.join(seeds, n))
        if n.startswith(("jit_track_batched", "jit__lambda")):
            assert size > 100_000, (n, size)
        else:
            assert size > 1_000, (n, size)
