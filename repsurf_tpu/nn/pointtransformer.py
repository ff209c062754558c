"""PointTransformer blocks (segmentation baseline).

TPU re-design of segmentation/modules/pointtransformer_utils.py:7-134:
local vector attention over kNN neighborhoods with shared attention planes,
TransitionDown (FPS + kNN group + linear + max-pool) and TransitionUp
(3-NN interpolation fusion / global-context head).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.gather import index_points
from ..ops.interpolate import three_interpolate
from ..ops.masking import counts_to_mask
from ..ops.neighbors import knn
from .blocks import _sample
from .layers import Linear, MaskedBatchNorm


class PointTransformerLayer(nn.Module):
    """Local vector attention (pointtransformer_utils.py:7-42).

    w = MLP(k - q + pos_enc); softmax over the k neighbors; output =
    sum_k (v + pos_enc) * w with ``share_planes`` channels sharing one
    attention weight.
    """

    out_planes: int
    share_planes: int = 8
    nsample: int = 16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pos, feat, valid=None, train=True):
        B, N, _ = pos.shape
        mid = self.out_planes
        x_q = Linear(mid)(feat)
        x_k = Linear(mid)(feat)
        x_v = Linear(self.out_planes)(feat)

        idx, _ = knn(self.nsample, pos, pos, valid=valid)
        p_r = index_points(pos, idx) - pos[:, :, None]  # [B,N,k,3]
        g_k = index_points(x_k, idx)  # [B,N,k,mid]
        g_v = index_points(x_v, idx)  # [B,N,k,out]

        mask = (
            None if valid is None else counts_to_mask(valid, N)[:, :, None]
        )  # broadcast over k

        # positional encoding: Linear(3) -> BN -> ReLU -> Linear(out)
        pe = Linear(3)(p_r)
        pe = MaskedBatchNorm(axis_name=self.axis_name)(
            pe, mask=mask, use_running_average=not train
        )
        pe = jax.nn.relu(pe)
        pe = Linear(self.out_planes)(pe)

        w = g_k - x_q[:, :, None] + pe  # [B,N,k,mid] (out == mid)
        # attention MLP: BN -> ReLU -> Linear(mid/s) -> BN -> ReLU -> Linear(out/s)
        w = MaskedBatchNorm(axis_name=self.axis_name)(
            w, mask=mask, use_running_average=not train
        )
        w = jax.nn.relu(w)
        w = Linear(mid // self.share_planes)(w)
        w = MaskedBatchNorm(axis_name=self.axis_name)(
            w, mask=mask, use_running_average=not train
        )
        w = jax.nn.relu(w)
        w = Linear(self.out_planes // self.share_planes)(w)
        w = jax.nn.softmax(w, axis=2)  # over neighbors

        s = self.share_planes
        v = (g_v + pe).reshape(B, N, self.nsample, s, self.out_planes // s)
        out = jnp.sum(v * w[:, :, :, None, :], axis=2)
        return out.reshape(B, N, self.out_planes)


class TransitionDown(nn.Module):
    """pointtransformer_utils.py:45-76: stride>1 — FPS, kNN grouping of
    [relative xyz, feat], Linear(no bias)+BN+ReLU, max-pool; stride==1 —
    pointwise Linear+BN+ReLU."""

    out_planes: int
    stride: int = 1
    nsample: int = 16
    num_sector: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pos, feat, valid=None, train=True):
        if self.stride == 1:
            N = pos.shape[1]
            mask = None if valid is None else counts_to_mask(valid, N)[..., None]
            x = Linear(self.out_planes, use_bias=False)(feat)
            x = MaskedBatchNorm(axis_name=self.axis_name)(
                x, mask=mask, use_running_average=not train
            )
            return pos, jax.nn.relu(x), valid

        idx, new_valid = _sample(pos, None, self.stride, valid, self.num_sector, train)
        new_pos = index_points(pos, idx)
        gidx, _ = knn(self.nsample, pos, new_pos, valid=valid)
        g_pos = index_points(pos, gidx) - new_pos[:, :, None]
        g_feat = index_points(feat, gidx)
        x = jnp.concatenate([g_pos, g_feat], axis=-1)
        M = x.shape[1]
        mask = None if new_valid is None else counts_to_mask(new_valid, M)[:, :, None]
        x = Linear(self.out_planes, use_bias=False)(x)
        x = MaskedBatchNorm(axis_name=self.axis_name)(
            x, mask=mask, use_running_average=not train
        )
        x = jax.nn.relu(x)
        x = jnp.max(x, axis=2)
        return new_pos, x, new_valid


class TransitionUp(nn.Module):
    """pointtransformer_utils.py:79-110.  Head mode (no coarse input): concat
    each point with its sample's transformed global mean; otherwise fuse
    linear1(fine) + interpolate(linear2(coarse))."""

    out_planes: Optional[int] = None  # None => head mode
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        pos1,
        feat1,
        valid1=None,
        pos2=None,
        feat2=None,
        valid2=None,
        train=True,
    ):
        N = feat1.shape[1]
        mask1 = None if valid1 is None else counts_to_mask(valid1, N)[..., None]
        if pos2 is None:
            in_planes = feat1.shape[-1]
            if valid1 is None:
                mean = jnp.mean(feat1, axis=1, keepdims=True)
            else:
                m = counts_to_mask(valid1, N)[..., None].astype(feat1.dtype)
                mean = jnp.sum(feat1 * m, axis=1, keepdims=True) / jnp.maximum(
                    jnp.sum(m, axis=1, keepdims=True), 1.0
                )
            # linear2: Linear + ReLU (no BN) on the per-sample mean
            g = jax.nn.relu(Linear(in_planes)(mean))
            x = jnp.concatenate([feat1, jnp.broadcast_to(g, feat1.shape)], axis=-1)
            x = Linear(in_planes)(x)
            x = MaskedBatchNorm(axis_name=self.axis_name)(
                x, mask=mask1, use_running_average=not train
            )
            return jax.nn.relu(x)

        M = feat2.shape[1]
        mask2 = None if valid2 is None else counts_to_mask(valid2, M)[..., None]
        a = Linear(self.out_planes)(feat1)
        a = MaskedBatchNorm(axis_name=self.axis_name)(
            a, mask=mask1, use_running_average=not train
        )
        a = jax.nn.relu(a)
        b = Linear(self.out_planes)(feat2)
        b = MaskedBatchNorm(axis_name=self.axis_name)(
            b, mask=mask2, use_running_average=not train
        )
        b = jax.nn.relu(b)
        return a + three_interpolate(pos2, pos1, b, valid_src=valid2)


class PointTransformerBlock(nn.Module):
    """Residual block (pointtransformer_utils.py:113-134)."""

    planes: int
    share_planes: int = 8
    nsample: int = 16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pos, feat, valid=None, train=True):
        N = pos.shape[1]
        mask = None if valid is None else counts_to_mask(valid, N)[..., None]
        identity = feat
        x = Linear(self.planes, use_bias=False)(feat)
        x = MaskedBatchNorm(axis_name=self.axis_name)(
            x, mask=mask, use_running_average=not train
        )
        x = jax.nn.relu(x)
        x = PointTransformerLayer(
            out_planes=self.planes,
            share_planes=self.share_planes,
            nsample=self.nsample,
            axis_name=self.axis_name,
        )(pos, x, valid=valid, train=train)
        x = MaskedBatchNorm(axis_name=self.axis_name)(
            x, mask=mask, use_running_average=not train
        )
        x = jax.nn.relu(x)
        x = Linear(self.planes, use_bias=False)(x)
        x = MaskedBatchNorm(axis_name=self.axis_name)(
            x, mask=mask, use_running_average=not train
        )
        return pos, jax.nn.relu(x + identity), valid
