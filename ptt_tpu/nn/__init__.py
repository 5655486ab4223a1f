"""Neural-network layer: flax.linen modules for the PTT/P2B model family.

Channel-last re-designs of the reference's torch modules (SURVEY.md section 2.1):
SharedMLP/conv stacks (pytorch_utils.py), set-abstraction (pointnet2_modules.py),
the 9 transformer variants (transformer_block/), CosineSimAug (p2b_xcoor.py), the two
voting heads, and the top-level config-built tracker (trackers/ptt.py).
"""

from .tracker import PTT, build_network, ALL_TRACKERS
from .losses import compute_losses

__all__ = ["PTT", "build_network", "ALL_TRACKERS", "compute_losses"]
