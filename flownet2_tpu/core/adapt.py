"""Resolution adaptation: the reference's $ADAPTED_*$ / $SCALE_*$ contract.

The FlowNet nets are fully convolutional but downsample by 64, so inputs are
resized (bilinearly) to the next multiple of 64 and the predicted flow is
resized back and rescaled per-axis (reference: scripts/run-flownet.py:37-48
computes ADAPTED_* = ceil(dim/64)*64 and SCALE_* = target/adapted, which the
deploy templates consume in their input Resample and final scaled Resample).

The reference does this with text templating on prototxts; here it is plain
shape arithmetic feeding a jit-compiled program per adapted size.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import ceil

DIVISOR = 64


@dataclass(frozen=True)
class AdaptedGeometry:
    target_height: int
    target_width: int
    adapted_height: int
    adapted_width: int

    @property
    def scale_width(self) -> float:
        """Multiplier applied to u (x-flow) when resizing back to target size."""
        return self.target_width / float(self.adapted_width)

    @property
    def scale_height(self) -> float:
        return self.target_height / float(self.adapted_height)

    @property
    def needs_resize(self) -> bool:
        return (self.target_height, self.target_width) != (
            self.adapted_height,
            self.adapted_width,
        )


def adapt_shape(height: int, width: int, divisor: int = DIVISOR) -> AdaptedGeometry:
    """Compute the /64-adapted geometry for an input resolution."""
    return AdaptedGeometry(
        target_height=height,
        target_width=width,
        adapted_height=int(ceil(height / float(divisor)) * divisor),
        adapted_width=int(ceil(width / float(divisor)) * divisor),
    )
