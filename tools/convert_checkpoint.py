"""Convert checkpoints between the reference PyTorch layout and this framework.

Forward (torch -> orbax; the default):
    python tools/convert_checkpoint.py --cfg_file tools/cfgs/kitti_models/ptt.yaml \
        --torch_ckpt /path/to/ptt_kitti_car.pth --out /path/to/converted_ckpt
Then:
    python tools/test_tracking.py --cfg_file ... --ckpt /path/to/converted_ckpt

Reverse (orbax/npz -> torch .pth; validate TPU-trained weights inside the
reference stack):
    python tools/convert_checkpoint.py --reverse --cfg_file ... \
        --ckpt /path/to/orbax_dir_or.npz --out /path/to/exported.pth \
        [--template /path/to/reference.pth]

The forward conversion is strict by default: every flax tensor must come from the
torch state_dict and every torch tensor (minus known config buffers) must be
consumed; use --no-strict for partial/transfer conversions. The reverse export
with --template additionally carries the template's non-parameter buffers
(num_batches_tracked, loss pos_weight) so torch load_state_dict(strict=True)
accepts the result.
"""

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from ptt_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file


def init_variables(cfg):
    import jax
    import jax.numpy as jnp

    from ptt_tpu.nn import build_network

    model = build_network(cfg.MODEL)
    batch = {
        "search_points": jnp.zeros((1, int(cfg.DATA_CONFIG["SEARCH_INPUT_SIZE"]), 3)),
        "template_points": jnp.zeros((1, int(cfg.DATA_CONFIG["TEMPLATE_INPUT_SIZE"]), 3)),
    }
    return jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, train=False))(batch)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True,
                        help="model config matching the checkpoint's architecture")
    parser.add_argument("--torch_ckpt", type=str, default=None,
                        help="(forward) reference .pth to convert")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="(reverse) orbax dir or .npz of this framework to export")
    parser.add_argument("--out", type=str, required=True,
                        help="output: orbax dir (forward) or .pth path (reverse)")
    parser.add_argument("--reverse", action="store_true", default=False,
                        help="export flax -> reference torch .pth instead")
    parser.add_argument("--template", type=str, default=None,
                        help="(reverse) reference .pth whose shapes/buffers to match")
    parser.add_argument("--no-strict", dest="strict", action="store_false", default=True)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)

    import jax

    from ptt_tpu.train import checkpoint

    variables = init_variables(cfg)

    if args.reverse:
        if args.ckpt is None:
            parser.error("--reverse needs --ckpt (orbax dir or .npz)")
        from ptt_tpu.utils.torch_converter import save_torch_checkpoint

        params, batch_stats = checkpoint.load_params_from_file(
            checkpoint.resolve_checkpoint_path(args.ckpt),
            variables["params"], variables.get("batch_stats", {}),
        )
        template = None
        if args.template:
            import torch

            t = torch.load(args.template, map_location="cpu", weights_only=False)
            template = t.get("model_state", t) if isinstance(t, dict) else t
        save_torch_checkpoint(args.out, params, batch_stats, template=template)
        n = len(jax.tree_util.tree_leaves(params))
        print(f"exported {n} parameter tensors to torch checkpoint {args.out}")
        return

    if args.torch_ckpt is None:
        parser.error("forward conversion needs --torch_ckpt")
    from ptt_tpu.utils.torch_converter import load_torch_checkpoint

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
