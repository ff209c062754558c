"""PointNet++ SSG segmentation baseline.

Re-designs segmentation/models/pointnet2/pointnet2_ssg.py:11-47: four
stride-4 SA stages (sector FPS on stage 1), four concat-skip FP stages, and
the shared per-point head.
"""

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import PointNetFeaturePropagation, PointNetSetAbstraction
from ..ops.masking import counts_to_mask
from .repsurf_seg import _SegHead


class PointNet2Segmentor(nn.Module):
    num_class: int = 13
    num_sector: int = 4
    axis_name: Optional[str] = None

    sa_stride: Sequence[int] = (4, 4, 4, 4)
    sa_nsample: Sequence[int] = (32, 32, 32, 32)
    sa_mlp: Sequence[Sequence[int]] = (
        (32, 32, 64),
        (64, 64, 128),
        (128, 128, 256),
        (256, 256, 512),
    )
    fp_mlp: Sequence[Sequence[int]] = (
        (256, 256),
        (256, 256),
        (256, 128),
        (128, 128, 128),
    )

    @nn.compact
    def __call__(self, pos, feature, valid=None, train=True):
        feat0 = jnp.concatenate([pos, feature], axis=-1)
        xyzs, feats, valids = [pos], [feat0], [valid]
        n_stages = len(self.sa_stride)
        for i in range(n_stages):
            x, f, v = PointNetSetAbstraction(
                stride=self.sa_stride[i],
                nsample=self.sa_nsample[i],
                mlp=tuple(self.sa_mlp[i]),
                num_sector=self.num_sector if i == 0 else 1,
                axis_name=self.axis_name,
                name=f"sa{i + 1}",
            )(xyzs[-1], feats[-1], valid=valids[-1], train=train)
            xyzs.append(x)
            feats.append(f)
            valids.append(v)

        x = feats[n_stages]
        for j in range(n_stages, 0, -1):
            k = n_stages - j
            skip_feat = feats[j - 1] if j > 1 else None
            x = PointNetFeaturePropagation(
                mlp=tuple(self.fp_mlp[k]),
                axis_name=self.axis_name,
                name=f"fp{j}",
            )(
                xyzs[j - 1],
                skip_feat,
                xyzs[j],
                x,
                valid1=valids[j - 1],
                valid2=valids[j],
                train=train,
            )

        mask = None if valid is None else counts_to_mask(valid, pos.shape[1])[..., None]
        return _SegHead(
            num_class=self.num_class, axis_name=self.axis_name, name="classifier"
        )(x, mask=mask, train=train)


def pointnet2_ssg(num_class=13, **kw):
    return PointNet2Segmentor(num_class=num_class, **kw)
