"""Umbrella RepSurf semantic-segmentation model (S3DIS-style scenes).

Re-designs segmentation/models/repsurf/repsurf_umb_ssg.py:11-63 for the
padded [B, N, C] + valid layout: a seg-style umbrella constructor, four
stride-4 kNN SA-CD stages (sector-parallel FPS on stage 1), four FP-CD
stages, and a per-point classifier head.  Output: [B, N, num_class] logits
(padded rows carry garbage; mask with the valid counts / ignore label).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import (
    SurfaceAbstractionCD,
    SurfaceFeaturePropagationCD,
    UmbrellaSurfaceConstructor,
)
from ..nn.layers import Linear, MaskedBatchNorm
from ..ops.masking import counts_to_mask


class _SegHead(nn.Module):
    num_class: int
    hidden: int = 128
    dropout: float = 0.5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train=True):
        x = Linear(self.hidden)(x)
        x = MaskedBatchNorm(axis_name=self.axis_name)(
            x, mask=mask, use_running_average=not train
        )
        x = jax.nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return Linear(self.num_class)(x)


class RepSurfSegmentor(nn.Module):
    """PointNet++-SSG segmentation backbone with Umbrella RepSurf features."""

    num_class: int = 13
    group_size: int = 8
    return_polar: bool = False
    random_inv: bool = True
    num_sector: int = 4  # sector-parallel FPS on stage 1 (reference sa1)
    head_dropout: float = 0.5  # reference classifier Dropout(0.5)
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
        """pos: [B, N, 3]; feature: [B, N, C_in-3] (RGB for S3DIS);
        valid: [B] counts.  Returns per-point logits [B, N, num_class]."""
        pos_channel = 6 if self.return_polar else 3

        normal = UmbrellaSurfaceConstructor(
            k=self.group_size + 1,
            in_channel=10,
            out_channel=10,
            style="seg",
            random_inv=self.random_inv,
            axis_name=self.axis_name,
            name="surface_constructor",
        )(pos, valid=valid, train=train)

        # stage 0 feature: cat[xyz, rgb] (reference repsurf_umb_ssg.py:43-48)
        feat0 = jnp.concatenate([pos, feature], axis=-1)

        centers, normals, feats, valids = [pos], [normal], [feat0], [valid]
        n_stages = len(self.sa_stride)
        for i in range(n_stages):
            c, n, f, v = SurfaceAbstractionCD(
                stride=self.sa_stride[i],
                nsample=self.sa_nsample[i],
                pos_channel=pos_channel,
                mlp=tuple(self.sa_mlp[i]),
                grouping="knn",
                return_polar=self.return_polar,
                num_sector=self.num_sector if i == 0 else 1,
                axis_name=self.axis_name,
                name=f"sa{i + 1}",
            )(centers[-1], normals[-1], feats[-1], valid=valids[-1], train=train)
            centers.append(c)
            normals.append(n)
            feats.append(f)
            valids.append(v)

        # decoder: fp4 .. fp1 (skip connections from the encoder)
        x = feats[n_stages]
        for j in range(n_stages, 0, -1):
            k = n_stages - j  # 0..3 -> fp4..fp1 mlps in reference order
            skip_feat = feats[j - 1] if j > 1 else None
            x = SurfaceFeaturePropagationCD(
                mlp=tuple(self.fp_mlp[k]),
                skip=j > 1,
                axis_name=self.axis_name,
                name=f"fp{j}",
            )(
                centers[j - 1],
                skip_feat,
                centers[j],
                x,
                valid1=valids[j - 1],
                valid2=valids[j],
                train=train,
            )

        mask = (
            None
            if valid is None
            else counts_to_mask(valid, pos.shape[1])[..., None]
        )
        return _SegHead(
            num_class=self.num_class,
            dropout=self.head_dropout,
            axis_name=self.axis_name,
            name="classifier",
        )(x, mask=mask, train=train)


def repsurf_umb_ssg(num_class=13, **kw):
    return RepSurfSegmentor(num_class=num_class, **kw)
