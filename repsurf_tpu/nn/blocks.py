"""RepSurf / PointNet++ neural blocks (flax.linen, channels-last, masked).

TPU re-design of the module layer (SURVEY.md §2d):
  * classification/modules/repsurface_utils.py:135-307
  * segmentation/modules/repsurface_utils.py:15-329
  * segmentation/modules/pointnet2_utils.py:13-126

Both reference pipelines (dense [B,C,N] and ragged [sum(N),C]+offset) collapse
into one set of blocks over the canonical padded layout [B, N, C] + valid
counts.  Style switches ('cls' / 'seg') preserve the reference's per-task
quirks: umbrella MLP depth, feature concatenation order, ball-query vs kNN
grouping, self-neighbor handling, and the fixed-rotation azimuth sort.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.polar import xyz2sphere
from ..geometry.umbrella import umbrella_features
from ..ops.gather import index_points, index_points_multi
from ..ops.interpolate import three_interpolate
from ..ops.masking import counts_to_mask
from ..ops.neighbors import ball_group, knn
from ..ops.sampling import farthest_point_sample
from ..ops.sector import sectorized_fps
from .layers import Linear, MaskedBatchNorm


class SharedMLP(nn.Module):
    """Dense + BN + ReLU stack (the reference's 1x1-conv MLPs)."""

    features: Sequence[int]
    axis_name: Optional[str] = None
    init_type: str = "torch"

    @nn.compact
    def __call__(self, x, mask=None, train=True):
        for f in self.features:
            x = Linear(f, init_type=self.init_type)(x)
            x = MaskedBatchNorm(axis_name=self.axis_name)(
                x, mask=mask, use_running_average=not train
            )
            x = jax.nn.relu(x)
        return x


class UmbrellaSurfaceConstructor(nn.Module):
    """Umbrella RepSurf feature constructor.

    style='cls' mirrors classification/modules/repsurface_utils.py:252-307
    (3-layer Conv MLP, feature order [center, polar, normal, dist], self
    neighbor dropped, plain azimuth sort, configurable aggregation).
    style='seg' mirrors segmentation/modules/repsurface_utils.py:287-329
    (2-layer Conv MLP, order [polar, normal, dist, center], self neighbor
    kept, 45-degree fixed-rotation azimuth sort, sum aggregation).
    """

    k: int  # group_size + 1
    in_channel: int  # 10
    out_channel: int = 10
    style: str = "cls"
    aggr_type: str = "sum"  # sum | avg | max
    return_dist: bool = True
    random_inv: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, center, valid=None, train=True):
        """center: [B, N, 3] -> repsurf features [B, N, out_channel]."""
        B, N, _ = center.shape
        inv_sign = None
        if self.random_inv and self.has_rng("random_inv"):
            key = self.make_rng("random_inv")
            inv_sign = (
                jax.random.bernoulli(key, 0.5, (B,)).astype(jnp.float32) * 2.0 - 1.0
            )

        feat = umbrella_features(
            center,
            self.k,
            style=self.style,
            return_dist=self.return_dist,
            valid=valid,
            random_inv_sign=inv_sign,
            # bf16 features are the value the first Linear's default-precision
            # MXU matmul would truncate f32 to anyway — bit-identical logits
            # at half the HBM bytes (the XLA route ignores this and stays f32)
            out_dtype=jnp.bfloat16,
        )  # [B, N, G, C]

        mask = None if valid is None else counts_to_mask(valid, N)[:, :, None]

        def bn(x):
            return MaskedBatchNorm(axis_name=self.axis_name)(
                x, mask=mask, use_running_average=not train
            )

        if self.style == "seg":
            x = jax.nn.relu(bn(Linear(self.out_channel)(feat)))
            x = Linear(self.out_channel)(x)
        else:
            x = jax.nn.relu(bn(Linear(self.in_channel, use_bias=False)(feat)))
            x = jax.nn.relu(bn(Linear(self.in_channel)(x)))
            x = Linear(self.in_channel)(x)

        if self.aggr_type == "max":
            x = jnp.max(x, axis=2)
        elif self.aggr_type == "avg":
            x = jnp.mean(x, axis=2)
        else:
            x = jnp.sum(x, axis=2)
        return x


def _resolve_npoint(n, npoint, stride):
    """Static output width: explicit npoint (classification) or n // stride
    (segmentation, mirroring the per-offset-segment division in
    segmentation/modules/repsurface_utils.py:17-22)."""
    if (npoint is None) == (stride is None):
        raise ValueError("exactly one of npoint / stride must be set")
    return npoint if npoint is not None else max(n // stride, 1)


def _sample(center, npoint, stride, valid, num_sector, train):
    """FPS (plain or sectorized) + per-sample new counts."""
    n = center.shape[1]
    m = _resolve_npoint(n, npoint, stride)
    if valid is None:
        new_valid = None
        if num_sector > 1 and train:
            idx = sectorized_fps(center, m, num_sector)
        else:
            idx = farthest_point_sample(center, m)
    else:
        new_valid = valid // stride if stride is not None else jnp.minimum(valid, m)
        if num_sector > 1 and train:
            idx = sectorized_fps(center, m, num_sector, valid=valid, m_valid=new_valid)
        else:
            idx = farthest_point_sample(center, m, valid=valid)
    return idx, new_valid


def _route_ball_feature_check(center, tensors, pos_channel, return_polar):
    """Route to the fused ball-group feature kernel: TPU backend, cloud
    fits VMEM, float channels, and the CD split boundary matches the
    kernel's [rel(, polar)] pos layout."""
    return (
        jax.default_backend() == "tpu"
        and center.shape[1] <= 2048
        and pos_channel == (6 if return_polar else 3)
        and all(
            t is None or jnp.issubdtype(t.dtype, jnp.floating)
            for t in tensors
        )
    )


class SurfaceAbstractionCD(nn.Module):
    """Surface Abstraction with channel de-differentiation.

    Mirrors classification/modules/repsurface_utils.py:186-249 (ball-query
    grouping, 'ball') and segmentation/modules/repsurface_utils.py:176-230
    (stride + kNN grouping, 'knn').  The position channels and feature
    channels get separate first-layer Linear+BN branches that are summed
    ('channel de-differentiation') before the shared MLP + max-pool.
    """

    npoint: Optional[int] = None  # static sample count (classification style)
    stride: Optional[int] = None  # or stride divisor (segmentation style)
    nsample: Optional[int] = None
    feat_channel: int = 0  # kept for config parity; channels come from inputs
    pos_channel: int = 3
    mlp: Sequence[int] = ()
    radius: Optional[float] = None  # ball grouping radius ('ball' mode)
    grouping: str = "ball"  # ball | knn
    group_all: bool = False
    return_normal: bool = True
    return_polar: bool = False
    num_sector: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, center, normal, feature, valid=None, train=True):
        """center [B,N,3], normal [B,N,D], feature [B,N,C] or None ->
        (new_center [B,M,3], new_normal [B,M,D], new_feature [B,M,mlp[-1]],
        new_valid [B] or None)."""
        B, N, _ = center.shape

        if self.group_all:
            new_center = jnp.zeros((B, 1, 3), center.dtype)
            new_normal = new_center
            new_valid = None if valid is None else jnp.ones_like(valid)
            group_center = center[:, None]  # [B,1,N,3] absolute coords
            if self.return_polar:
                group_center = jnp.concatenate(
                    [group_center, xyz2sphere(group_center)], axis=-1
                )
            parts = [group_center]
            if self.return_normal:
                parts.append(normal[:, None])
            if feature is not None:
                parts.append(feature[:, None])
            new_feature = jnp.concatenate(parts, axis=-1)
        else:
            idx, new_valid = _sample(
                center, self.npoint, self.stride, valid, self.num_sector, train
            )
            new_center, new_normal = index_points_multi(idx, center, normal)

            tensors = [center]
            if self.return_normal:
                tensors.append(normal)
            if feature is not None:
                tensors.append(feature)
            if self.grouping == "ball" and _route_ball_feature_check(
                center, tensors, self.pos_channel, self.return_polar
            ):
                # fused Pallas path: ball query + gathers + rel/polar/concat
                # in one kernel, emitting the CD split (pos, feat) in bf16 —
                # bit-identical MXU operands, ~halved HBM traffic and none
                # of the slice/convert/layout fusions (see the kernel doc)
                from ..ops.pallas.ball_group import ball_group_feature_pallas

                pos, feat = ball_group_feature_pallas(
                    self.radius, self.nsample, center, new_center, tensors,
                    valid=valid, return_polar=self.return_polar,
                    out_dtype=jnp.bfloat16,
                )
                return self._cd_tail(
                    pos, feat, new_center, new_normal, new_valid, train
                )
            if self.grouping == "ball":
                group_center, group_normal, group_feature = ball_group(
                    self.radius, self.nsample, center, new_center,
                    (center, normal, feature), valid=valid,
                )
            else:
                gidx, _ = knn(self.nsample, center, new_center, valid=valid)
                group_center, group_normal, group_feature = index_points_multi(
                    gidx, center, normal, feature
                )
            group_center_norm = group_center - new_center[:, :, None]
            if self.return_polar:
                group_center_norm = jnp.concatenate(
                    [group_center_norm, xyz2sphere(group_center_norm)], axis=-1
                )
            parts = [group_center_norm]
            if self.return_normal:
                parts.append(group_normal)
            if group_feature is not None:
                parts.append(group_feature)
            new_feature = jnp.concatenate(parts, axis=-1)

        pos = new_feature[..., : self.pos_channel]
        feat = new_feature[..., self.pos_channel :]
        return self._cd_tail(pos, feat, new_center, new_normal, new_valid, train)

    def _cd_tail(self, pos, feat, new_center, new_normal, new_valid, train):
        """CD split MLP + neighbor max-pool (shared by the XLA and fused
        Pallas grouping paths; identical module order => identical params)."""
        M = pos.shape[1]
        mask = None if new_valid is None else counts_to_mask(new_valid, M)[:, :, None]
        loc = MaskedBatchNorm(axis_name=self.axis_name)(
            Linear(self.mlp[0])(pos), mask=mask, use_running_average=not train
        )
        fea = MaskedBatchNorm(axis_name=self.axis_name)(
            Linear(self.mlp[0])(feat), mask=mask, use_running_average=not train
        )
        x = jax.nn.relu(loc + fea)
        x = SharedMLP(tuple(self.mlp[1:]), axis_name=self.axis_name)(
            x, mask=mask, train=train
        )
        x = jnp.max(x, axis=2)  # pool over the neighbor axis
        return new_center, new_normal, x, new_valid


class SurfaceAbstraction(nn.Module):
    """Plain (non-CD) surface abstraction — classification
    repsurface_utils.py:135-183 / segmentation repsurface_utils.py:134-173."""

    npoint: Optional[int] = None
    stride: Optional[int] = None
    nsample: Optional[int] = None
    mlp: Sequence[int] = ()
    radius: Optional[float] = None
    grouping: str = "ball"
    group_all: bool = False
    return_normal: bool = True
    return_polar: bool = True
    num_sector: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, center, normal, feature, valid=None, train=True):
        B, N, _ = center.shape
        if self.group_all:
            new_center = jnp.zeros((B, 1, 3), center.dtype)
            new_normal = new_center
            new_valid = None if valid is None else jnp.ones_like(valid)
            group_center = center[:, None]
            if self.return_polar:
                group_center = jnp.concatenate(
                    [group_center, xyz2sphere(group_center)], axis=-1
                )
            parts = [group_center]
            if self.return_normal:
                parts.append(normal[:, None])
            if feature is not None:
                parts.append(feature[:, None])
            x = jnp.concatenate(parts, axis=-1)
        else:
            idx, new_valid = _sample(
                center, self.npoint, self.stride, valid, self.num_sector, train
            )
            new_center, new_normal = index_points_multi(idx, center, normal)
            if self.grouping == "ball":
                group_center, group_normal, group_feature = ball_group(
                    self.radius, self.nsample, center, new_center,
                    (center, normal, feature), valid=valid,
                )
            else:
                gidx, _ = knn(self.nsample, center, new_center, valid=valid)
                group_center, group_normal, group_feature = index_points_multi(
                    gidx, center, normal, feature
                )
            group_center_norm = group_center - new_center[:, :, None]
            if self.return_polar:
                group_center_norm = jnp.concatenate(
                    [group_center_norm, xyz2sphere(group_center_norm)], axis=-1
                )
            parts = [group_center_norm]
            if self.return_normal:
                parts.append(group_normal)
            if group_feature is not None:
                parts.append(group_feature)
            x = jnp.concatenate(parts, axis=-1)

        M = x.shape[1]
        mask = None if new_valid is None else counts_to_mask(new_valid, M)[:, :, None]
        x = SharedMLP(tuple(self.mlp), axis_name=self.axis_name)(
            x, mask=mask, train=train
        )
        x = jnp.max(x, axis=2)
        return new_center, new_normal, x, new_valid


class SurfaceFeaturePropagationCD(nn.Module):
    """FP decoder with channel de-differentiation
    (segmentation/modules/repsurface_utils.py:233-284): 3-NN inverse-distance
    interpolation of first-layer-transformed coarse features, summed with a
    transformed skip branch, then a Linear+BN+ReLU stack."""

    mlp: Sequence[int]
    skip: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, xyz1, feat1, xyz2, feat2, valid1=None, valid2=None, train=True
    ):
        """xyz1/feat1: fine cloud (skip), xyz2/feat2: coarse cloud."""
        N1 = xyz1.shape[1]
        mask1 = None if valid1 is None else counts_to_mask(valid1, N1)[..., None]
        mask2 = (
            None if valid2 is None else counts_to_mask(valid2, feat2.shape[1])[..., None]
        )

        f2 = MaskedBatchNorm(axis_name=self.axis_name)(
            Linear(self.mlp[0])(feat2), mask=mask2, use_running_average=not train
        )
        interp = three_interpolate(xyz2, xyz1, f2, valid_src=valid2)

        if self.skip:
            s = MaskedBatchNorm(axis_name=self.axis_name)(
                Linear(self.mlp[0])(feat1), mask=mask1, use_running_average=not train
            )
            x = jax.nn.relu(interp + s)
        else:
            x = jax.nn.relu(interp)
        x = SharedMLP(tuple(self.mlp[1:]), axis_name=self.axis_name)(
            x, mask=mask1, train=train
        )
        return x


class PointNetSetAbstraction(nn.Module):
    """PointNet++ SA baseline block
    (segmentation/modules/pointnet2_utils.py:49-83): stride FPS + kNN
    grouping of [relative xyz, features], SharedMLP, max-pool."""

    npoint: Optional[int] = None
    stride: Optional[int] = None
    nsample: int = 32
    mlp: Sequence[int] = ()
    num_sector: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz, feature, valid=None, train=True):
        idx, new_valid = _sample(
            xyz, self.npoint, self.stride, valid, self.num_sector, train
        )
        new_xyz = index_points(xyz, idx)
        gidx, _ = knn(self.nsample, xyz, new_xyz, valid=valid)
        group_xyz, group_feature = index_points_multi(gidx, xyz, feature)
        group_norm = group_xyz - new_xyz[:, :, None]
        parts = [group_norm]
        if group_feature is not None:
            parts.append(group_feature)
        x = jnp.concatenate(parts, axis=-1)
        M = x.shape[1]
        mask = None if new_valid is None else counts_to_mask(new_valid, M)[:, :, None]
        x = SharedMLP(tuple(self.mlp), axis_name=self.axis_name)(
            x, mask=mask, train=train
        )
        x = jnp.max(x, axis=2)
        return new_xyz, x, new_valid


class PointNetFeaturePropagation(nn.Module):
    """PointNet++ FP baseline (segmentation/modules/pointnet2_utils.py:86-126):
    3-NN interpolation + concatenated skip + Linear/BN/ReLU stack."""

    mlp: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, xyz1, feat1, xyz2, feat2, valid1=None, valid2=None, train=True
    ):
        interp = three_interpolate(xyz2, xyz1, feat2, valid_src=valid2)
        if feat1 is not None:
            x = jnp.concatenate([feat1, interp], axis=-1)
        else:
            x = interp
        N1 = xyz1.shape[1]
        mask = None if valid1 is None else counts_to_mask(valid1, N1)[..., None]
        x = SharedMLP(tuple(self.mlp), axis_name=self.axis_name)(
            x, mask=mask, train=train
        )
        return x
