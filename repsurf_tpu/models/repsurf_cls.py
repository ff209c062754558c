"""Umbrella RepSurf classification models (ScanObjectNN / ModelNet40-style).

Re-designs classification/models/repsurf/repsurf_ssg_umb.py:11-57 and
repsurf_ssg_umb_2x.py:11-61 for the channels-last TPU layout.  Inputs are
[B, N, 3] point coordinates; output is [B, num_class] log-probabilities.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import SurfaceAbstractionCD, UmbrellaSurfaceConstructor
from ..nn.layers import Linear, MaskedBatchNorm
from ..nn.triangular import SurfaceConstructor

REPSURF_CHANNEL = 10
TRIANGULAR_CHANNEL = 7  # normal(3) + center(3) + plane constant(1)


class _ClsHead(nn.Module):
    """FC head: Linear+BN+ReLU+Dropout stack then class logits+log_softmax."""

    hidden: Sequence[int]
    num_class: int
    dropout: float = 0.4
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=True):
        for h in self.hidden:
            x = Linear(h)(x)
            x = MaskedBatchNorm(axis_name=self.axis_name)(
                x, use_running_average=not train
            )
            x = jax.nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = Linear(self.num_class)(x)
        return jax.nn.log_softmax(x, axis=-1)


class RepSurfClassifier(nn.Module):
    """Umbrella RepSurf + PointNet++-SSG classifier (repsurf_ssg_umb)."""

    num_class: int = 15
    group_size: int = 8
    umb_pool: str = "sum"
    return_dist: bool = True
    return_center: bool = True
    return_polar: bool = True
    random_inv: bool = True
    constructor: str = "umbrella"  # umbrella | triangular
    head_dropout: float = 0.4  # reference classifier Dropout(0.4)
    axis_name: Optional[str] = None

    # architecture (reference repsurf_ssg_umb.py:22-30)
    sa_npoint: Sequence[int] = (512, 128)
    sa_radius: Sequence[float] = (0.2, 0.4)
    sa_nsample: Sequence[int] = (32, 64)
    sa_mlp: Sequence[Sequence[int]] = ((64, 64, 128), (128, 128, 256))
    final_mlp: Sequence[int] = (256, 512, 1024)
    head_hidden: Sequence[int] = (512, 256)

    @nn.compact
    def __call__(self, points, train=True):
        if not self.return_center:
            raise ValueError("CD blocks require return_center=True")
        center = points[..., :3]
        pos_channel = 6 if self.return_polar else 3

        if self.constructor == "umbrella":
            normal = UmbrellaSurfaceConstructor(
                k=self.group_size + 1,
                in_channel=REPSURF_CHANNEL,
                style="cls",
                aggr_type=self.umb_pool,
                return_dist=self.return_dist,
                random_inv=self.random_inv,
                axis_name=self.axis_name,
                name="surface_constructor",
            )(center, train=train)
        else:
            # triangular variant: per-point triangle normal/center(+const)
            # features (the paper's non-umbrella path)
            parts = SurfaceConstructor(
                k=3,
                return_dist=self.return_dist,
                random_inv=self.random_inv,
                name="surface_constructor",
            )(center)
            normal = jnp.concatenate(parts, axis=-1)

        feature = None
        for i, (npoint, radius, nsample, mlp) in enumerate(
            zip(self.sa_npoint, self.sa_radius, self.sa_nsample, self.sa_mlp)
        ):
            center, normal, feature, _ = SurfaceAbstractionCD(
                npoint=npoint,
                radius=radius,
                nsample=nsample,
                pos_channel=pos_channel,
                mlp=tuple(mlp),
                grouping="ball",
                return_polar=self.return_polar,
                axis_name=self.axis_name,
                name=f"sa{i + 1}",
            )(center, normal, feature, train=train)

        _, _, feature, _ = SurfaceAbstractionCD(
            pos_channel=pos_channel,
            mlp=tuple(self.final_mlp),
            group_all=True,
            npoint=1,  # unused in group_all mode; keeps field validation happy
            return_polar=self.return_polar,
            axis_name=self.axis_name,
            name=f"sa{len(self.sa_npoint) + 1}",
        )(center, normal, feature, train=train)

        feature = feature.reshape(feature.shape[0], -1)
        return _ClsHead(
            hidden=tuple(self.head_hidden),
            num_class=self.num_class,
            dropout=self.head_dropout,
            axis_name=self.axis_name,
            name="classifier",
        )(feature, train=train)


def repsurf_ssg_umb(num_class=15, **kw):
    """Reference recipe repsurf_ssg_umb (classification/README.md:73-80)."""
    return RepSurfClassifier(num_class=num_class, **kw)


def repsurf_ssg_tri(num_class=15, **kw):
    """Triangular RepSurf classifier (triangle-based surface construction)."""
    return RepSurfClassifier(num_class=num_class, constructor="triangular", **kw)


def repsurf_ssg_umb_2x(num_class=15, **kw):
    """2x-width variant (classification/models/repsurf/repsurf_ssg_umb_2x.py)."""
    return RepSurfClassifier(
        num_class=num_class,
        sa_npoint=(512, 128, 32),
        sa_radius=(0.1, 0.2, 0.4),
        sa_nsample=(24, 24, 24),
        sa_mlp=((128, 128, 256), (256, 256, 512), (512, 512, 1024)),
        final_mlp=(1024, 1024, 2048),
        head_hidden=(512, 256),
        **kw,
    )
