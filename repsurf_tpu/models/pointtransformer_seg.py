"""PointTransformer segmentation model.

Re-designs segmentation/models/pointtransformer/pointtransformer.py:6-61:
5 encoder stages (block counts 2,3,4,6,3; strides 1,4,4,4,4; nsample 16;
sector FPS on stage 2) and 5 decoder stages of TransitionUp + blocks, with
a Linear+BN+ReLU+Linear head.
"""

from typing import Optional, Sequence

import jax
from flax import linen as nn

from ..nn.layers import Linear, MaskedBatchNorm
from ..nn.pointtransformer import (
    PointTransformerBlock,
    TransitionDown,
    TransitionUp,
)
from ..ops.masking import counts_to_mask


class PointTransformerSegmentor(nn.Module):
    num_class: int = 13
    in_channel: int = 6
    share_planes: int = 8
    num_sector: int = 4
    planes: Sequence[int] = (32, 64, 128, 256, 512)
    enc_blocks: Sequence[int] = (2, 3, 4, 6, 3)
    strides: Sequence[int] = (1, 4, 4, 4, 4)
    nsample: Sequence[int] = (16, 16, 16, 16, 16)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pos, feature, valid=None, train=True):
        import jax.numpy as jnp

        x = (
            pos
            if self.in_channel == 3
            else jnp.concatenate([pos, feature], axis=-1)
        )

        # encoder
        stages = []
        p, v = pos, valid
        for i in range(5):
            p, x, v = TransitionDown(
                out_planes=self.planes[i],
                stride=self.strides[i],
                nsample=self.nsample[i],
                num_sector=self.num_sector if i == 1 else 1,
                axis_name=self.axis_name,
                name=f"enc{i + 1}_down",
            )(p, x, valid=v, train=train)
            for b in range(1, self.enc_blocks[i]):
                p, x, v = PointTransformerBlock(
                    planes=self.planes[i],
                    share_planes=self.share_planes,
                    nsample=self.nsample[i],
                    axis_name=self.axis_name,
                    name=f"enc{i + 1}_block{b}",
                )(p, x, valid=v, train=train)
            stages.append((p, x, v))

        # decoder (dec5 head, then dec4..dec1 fusing coarse into fine)
        p5, x5, v5 = stages[4]
        x = TransitionUp(out_planes=None, axis_name=self.axis_name, name="dec5_up")(
            p5, x5, valid1=v5, train=train
        )
        for b in range(1, 2):
            p5, x, v5 = PointTransformerBlock(
                planes=self.planes[4],
                share_planes=self.share_planes,
                nsample=self.nsample[4],
                axis_name=self.axis_name,
                name=f"dec5_block{b}",
            )(p5, x, valid=v5, train=train)
        coarse = (p5, x, v5)

        for i in range(3, -1, -1):
            pi, xi, vi = stages[i]
            pc, xc, vc = coarse
            x = TransitionUp(
                out_planes=self.planes[i],
                axis_name=self.axis_name,
                name=f"dec{i + 1}_up",
            )(pi, xi, valid1=vi, pos2=pc, feat2=xc, valid2=vc, train=train)
            for b in range(1, 2):
                pi, x, vi = PointTransformerBlock(
                    planes=self.planes[i],
                    share_planes=self.share_planes,
                    nsample=self.nsample[i],
                    axis_name=self.axis_name,
                    name=f"dec{i + 1}_block{b}",
                )(pi, x, valid=vi, train=train)
            coarse = (pi, x, vi)

        mask = (
            None
            if valid is None
            else counts_to_mask(valid, pos.shape[1])[..., None]
        )
        x = Linear(self.planes[0])(x)
        x = MaskedBatchNorm(axis_name=self.axis_name)(
            x, mask=mask, use_running_average=not train
        )
        x = jax.nn.relu(x)
        return Linear(self.num_class)(x)


def pointtransformer(num_class=13, **kw):
    return PointTransformerSegmentor(num_class=num_class, **kw)
