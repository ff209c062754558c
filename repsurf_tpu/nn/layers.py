"""Core NN primitives: linear layers with PyTorch-parity initialization and
batch normalization with masked statistics.

The reference's 1x1 Conv1d/Conv2d stacks are channel-mixing matmuls; in the
channels-last layout they are plain Dense layers, which XLA maps straight
onto the MXU (SURVEY.md §3 hot loop (3)).

``MaskedBatchNorm`` replaces torch.nn.BatchNorm1d/2d.  Two differences matter
for parity:
  * statistics can be masked so padded rows of a fixed-shape batch never
    pollute them (the reference's ragged layout had no padding);
  * an optional ``axis_name`` turns it into SyncBatchNorm under shard_map
    (cross-device ``pmean`` of the moment sums — the TPU analog of
    nn.SyncBatchNorm, segmentation/tool/train.py:141-142).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_init(fan_in):
    """PyTorch default Linear/Conv init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))
    for both kernel and bias (kaiming_uniform with a=sqrt(5))."""
    bound = 1.0 / jnp.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_init(fan_in):
    """torch.nn.init.kaiming_normal_ (fan_in, relu gain sqrt(2))."""
    std = jnp.sqrt(2.0 / fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


def xavier_normal_init(fan_in, fan_out):
    std = jnp.sqrt(2.0 / (fan_in + fan_out))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


class Linear(nn.Module):
    """Dense layer over the trailing channel axis with torch-default init.

    Equivalent to nn.Linear / 1x1 nn.Conv1d / 1x1 nn.Conv2d of the reference
    (channels-last: any number of leading axes).
    """

    features: int
    use_bias: bool = True
    init_type: str = "torch"  # torch | kaiming | xavier

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        if self.init_type == "torch":
            k_init = torch_linear_init(fan_in)
        elif self.init_type == "kaiming":
            k_init = kaiming_normal_init(fan_in)
        elif self.init_type == "xavier":
            k_init = xavier_normal_init(fan_in, self.features)
        else:
            raise ValueError(self.init_type)
        kernel = self.param("kernel", k_init, (fan_in, self.features))
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
        if self.use_bias:
            # torch biases are always U(+-1/sqrt(fan_in)); init-scheme
            # overrides set them to zero (classification util/utils.py:38)
            b_init = (
                torch_linear_init(fan_in)
                if self.init_type == "torch"
                else nn.initializers.zeros
            )
            bias = self.param("bias", b_init, (self.features,))
            y = y + bias
        return y


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all non-channel axes with optional row masking and
    optional cross-device synchronization.

    Matches torch BatchNorm semantics: biased variance for normalization,
    unbiased for the running estimate, momentum 0.1
    (new = 0.9 * old + 0.1 * batch), eps 1e-5.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average=False):
        """Args:
        x: [..., C].
        mask: optional bool array broadcastable to x.shape[:-1]; True rows
          contribute to the statistics.
        use_running_average: eval mode (use stored running stats).
        """
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # Two-pass moments (mean first, then centered second moment):
            # the one-pass E[x^2] - E[x]^2 form cancels catastrophically in
            # f32 for low-variance channels and measurably diverged from the
            # torch reference's train-mode forward (2.7e-2 on the umbrella
            # constructor output with inputs agreeing to 1e-6 — caught by
            # tests/test_train_parity.py).  Under axis_name this costs a
            # second psum round; BN is a negligible slice of step time.
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            if mask is None:
                import math

                cnt = jnp.asarray(float(math.prod(x.shape[:-1])), jnp.float32)
                s = jnp.sum(xf, axis=axes)
                if self.axis_name is not None:
                    cnt = jax.lax.psum(cnt, self.axis_name)
                    s = jax.lax.psum(s, self.axis_name)
                cnt = jnp.maximum(cnt, 1.0)
                mean = s / cnt
                cs = jnp.sum(jnp.square(xf - mean), axis=axes)
            else:
                if mask.ndim == x.ndim and mask.shape[-1] == 1:
                    mask = mask[..., 0]  # accept [..., 1] channel-style masks
                w = jnp.broadcast_to(mask, x.shape[:-1]).astype(jnp.float32)[..., None]
                cnt = jnp.sum(w)
                s = jnp.sum(xf * w, axis=axes)
                if self.axis_name is not None:
                    cnt = jax.lax.psum(cnt, self.axis_name)
                    s = jax.lax.psum(s, self.axis_name)
                cnt = jnp.maximum(cnt, 1.0)
                mean = s / cnt
                cs = jnp.sum(jnp.square(xf - mean) * w, axis=axes)
            if self.axis_name is not None:
                cs = jax.lax.psum(cs, self.axis_name)
            var = jnp.maximum(cs / cnt, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )

        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * (inv * scale) + bias
