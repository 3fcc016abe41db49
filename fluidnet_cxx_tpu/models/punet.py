"""PUNet — the TPU-native learned pressure projection (flagship model).

A multigrid-style pressure U-Net designed around the v5e MXU instead of
translated from the reference: the reference's MultiScaleNet
(ref: pytorch/lib/multi_scale_net.py:101-127) spends ~100 GFLOP/frame on
128-channel convolutions at FULL resolution, which caps a 512^2 projection
at ~4 ms — 25x slower than a fused Jacobi-100 solve and an inversion of
FluidNet's premise (ref: README.md:2-39). Pressure is governed by a Poisson
equation: the long-range response lives at coarse scales and only a local
correction is needed at fine scales, so a V-cycle-shaped network puts the
MXU-friendly wide convolutions at coarse levels and almost nothing at full
resolution.

Architecture (fully convolutional, NHWC, bf16 compute / f32 params+output):

* space-to-depth patchify (``patch``, default 8): the (div, occupancy) input
  moves to resolution h/patch with patch^2 * C channels — zero FLOPs, and all
  subsequent convs run with >= 64 channels where the MXU is efficient.
* U-Net encoder over ``widths`` levels (stride-2 3x3 conv + ``level_convs``
  3x3 convs each), bottleneck convs at the coarsest level.
* decoder: 1x1 conv expansion + depth-to-space upsample, skip concat,
  ``level_convs`` 3x3 convs.
* head: 1x1 conv to patch^2 channels + depth-to-space back to full
  resolution; optional thin full-resolution refinement stack (``refine_ch``
  channels over [p_coarse, div, occupancy]) — OFF by default, because the
  Jacobi polish sweeps deliver the same sub-patch detail ~70x cheaper.

The measured v5e cost model this is built on (marginal): a 3x3 conv costs
~30-45 us of fixed per-op overhead regardless of spatial size below 256^2,
so the forward time is dominated by op COUNT; keeping every conv at <= h/8
and the op count at ~9 gives a 0.34 ms forward at 512^2 (vs ScaleNet's
~4 ms), with FLOPs a second-order term.

High-frequency divergence left by the patchified head is killed by a few
warm-started Jacobi polish sweeps (``ModelConfig.polish_sweeps``, applied in
the FluidNet wrapper at ~1.4 us/sweep) — the learned solve plays the role of
a multigrid coarse-grid correction, the sweeps the role of the smoother.
"""
import flax.linen as nn
import jax.numpy as jnp


def space_to_depth(x, p: int):
    """(b, h, w, c) -> (b, h/p, w/p, p*p*c). Pure reshape/transpose."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // p, w // p, p * p * c)


def depth_to_space(x, p: int):
    """(b, h, w, p*p*c) -> (b, h*p, w*p, c). Inverse of space_to_depth."""
    b, h, w, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, h, w, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * p, w * p, c)


class PUNet(nn.Module):
    """Learned Poisson solve: (b,h,w,C_in) features -> (b,h,w,1) pressure.

    h and w must be divisible by patch * 2**(len(widths)-1).
    """
    patch: int = 8
    widths: tuple = (128, 128)
    level_convs: int = 1
    bottleneck_convs: int = 3
    # Kernel dilation of the bottleneck convs: at the coarsest level the
    # pressure response is still long-range (Poisson Green's function spans
    # the whole domain); dilation-d triples the receptive-field growth per
    # conv at zero extra op cost. RF at the bottleneck ~= 1 + 2*d*n_convs
    # coarse cells — size it so RF * patch * 2**(levels-1) >= the grid side.
    bottleneck_dilation: int = 1
    refine_ch: int = 8
    refine_convs: int = 0
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic  # no dropout; kept for wrapper API parity
        raw = x
        conv = lambda ch, k, name, s=1, dil=1: nn.Conv(
            ch, (k, k), strides=(s, s), padding="SAME", dtype=self.dtype,
            kernel_dilation=(dil, dil), name=name)

        # Patchify. All encoder/decoder compute happens at <= h/patch.
        x = space_to_depth(x, self.patch)
        x = nn.relu(conv(self.widths[0], 1, "embed")(x))

        # Encoder.
        skips = []
        for i, wd in enumerate(self.widths):
            if i > 0:
                x = nn.relu(conv(wd, 3, f"down{i}", s=2)(x))
            for j in range(self.level_convs):
                x = nn.relu(conv(wd, 3, f"enc{i}_{j}")(x))
            skips.append(x)

        # Bottleneck at the coarsest level (optionally dilated: long-range
        # pressure response at fixed op count).
        for j in range(self.bottleneck_convs):
            x = nn.relu(conv(self.widths[-1], 3, f"mid{j}",
                             dil=self.bottleneck_dilation)(x))

        # Decoder.
        for i in range(len(self.widths) - 2, -1, -1):
            wd = self.widths[i]
            x = conv(4 * wd, 1, f"up{i}")(x)
            x = depth_to_space(x, 2)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            for j in range(self.level_convs):
                x = nn.relu(conv(wd, 3, f"dec{i}_{j}")(x))

        # Head back to full resolution.
        x = conv(self.patch * self.patch, 1, "head")(x)
        p = depth_to_space(x, self.patch)  # (b, h, w, 1)

        # Thin full-resolution refinement for sub-patch detail.
        if self.refine_convs > 0:
            r = jnp.concatenate([p, raw], axis=-1)
            for j in range(self.refine_convs):
                r = nn.relu(conv(self.refine_ch, 3, f"ref{j}")(r))
            p = p + conv(1, 3, "ref_out")(r)

        return p.astype(jnp.float32)
