"""Convert a reference PyTorch checkpoint (.pth) to an orbax directory this
framework's eval/train CLIs load directly.

    python tools/convert_checkpoint.py --cfg_file tools/cfgs/kitti_models/ptt.yaml \
        --torch_ckpt /path/to/ptt_kitti_car.pth --out /path/to/converted_ckpt

Then:
    python tools/test_tracking.py --cfg_file ... --ckpt /path/to/converted_ckpt

The conversion is strict by default: every flax tensor must come from the torch
state_dict and every torch tensor (minus known config buffers) must be consumed;
use --no-strict for partial/transfer conversions.
"""

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from ptt_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True,
                        help="model config matching the checkpoint's architecture")
    parser.add_argument("--torch_ckpt", type=str, required=True)
    parser.add_argument("--out", type=str, required=True, help="output orbax dir")
    parser.add_argument("--no-strict", dest="strict", action="store_false", default=True)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)

    import jax
    import jax.numpy as jnp

    from ptt_tpu.nn import build_network
    from ptt_tpu.train import checkpoint
    from ptt_tpu.utils.torch_converter import load_torch_checkpoint

    model = build_network(cfg.MODEL)
    batch = {
        "search_points": jnp.zeros((1, int(cfg.DATA_CONFIG["SEARCH_INPUT_SIZE"]), 3)),
        "template_points": jnp.zeros((1, int(cfg.DATA_CONFIG["TEMPLATE_INPUT_SIZE"]), 3)),
    }
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, train=False))(batch)

    params, batch_stats, report = load_torch_checkpoint(
        args.torch_ckpt, variables["params"], variables["batch_stats"], strict=args.strict
    )
    if report["missing"] or report["unused"]:
        print(f"partial conversion: {len(report['missing'])} missing, "
              f"{len(report['unused'])} unused torch tensors")
        for line in report["missing"][:10] + report["unused"][:10]:
            print("  ", line)

    checkpoint.save_variables(
        args.out, params, batch_stats,
        metadata={"source": str(args.torch_ckpt), "cfg": str(args.cfg_file)},
    )
    n = len(jax.tree_util.tree_leaves(params))
    print(f"wrote {n} parameter tensors to {args.out}")


if __name__ == "__main__":
    main()
