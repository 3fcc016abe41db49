"""MultiScaleNet ('ScaleNet'): 3-resolution-branch pressure CNN.

Flax re-implementation of the reference architecture
(ref: pytorch/lib/multi_scale_net.py): a quarter-scale branch of 4 convs, a
half-scale branch of 6 convs fed the downsampled input concatenated with the
upsampled quarter output, a full-scale branch of 6 convs fed the input
concatenated with the upsampled half output, and a final 1x1 conv. Bilinear
resampling throughout (torch F.upsample(mode='bilinear')); jax.image.resize
'linear' matches align_corners=False half-pixel sampling.

NHWC layout.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize(x, hw):
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[3]), method="linear"
    )


class _Branch(nn.Module):
    """One resolution branch: stack of 3x3 convs (first/last optionally 5x5),
    ReLU after all but the last two, optional dropout before the last conv
    (ref: multi_scale_net.py:24-98)."""
    widths: tuple
    kernels: tuple
    dropout: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n = len(self.widths)
        for idx, (wd, k) in enumerate(zip(self.widths, self.kernels)):
            if self.dropout and idx == n - 1:
                x = nn.Dropout(0.5, deterministic=deterministic)(x)
            x = nn.Conv(wd, (k, k), padding="SAME", dtype=self.dtype)(x)
            if idx < n - 2:  # no ReLU after the last two convs
                x = nn.relu(x)
        return x


class MultiScaleNet(nn.Module):
    """(ref: multi_scale_net.py:101-127)"""
    dropout: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h, w = x.shape[1], x.shape[2]
        quarter = (int(h * 0.25), int(w * 0.25))
        half = (int(h * 0.5), int(w * 0.5))

        # Quarter scale: convs 3/3/3/3, widths 32,64,32,1.
        q_in = _resize(x, quarter)
        q_out = _Branch(
            widths=(32, 64, 32, 1), kernels=(3, 3, 3, 3),
            dropout=self.dropout, dtype=self.dtype, name="convN_4",
        )(q_in, deterministic)

        # Half scale: convs 5/3/3/3/3/3, widths 32,64,128,64,32,1.
        h_in = jnp.concatenate([_resize(x, half), _resize(q_out, half)], -1)
        h_out = _Branch(
            widths=(32, 64, 128, 64, 32, 1), kernels=(5, 3, 3, 3, 3, 3),
            dropout=self.dropout, dtype=self.dtype, name="convN_2",
        )(h_in, deterministic)

        # Full scale: convs 5/3/3/3/3/5, widths 32,64,128,64,32,8.
        f_in = jnp.concatenate([x, _resize(h_out, (h, w))], -1)
        f_out = _Branch(
            widths=(32, 64, 128, 64, 32, 8), kernels=(5, 3, 3, 3, 3, 5),
            dropout=self.dropout, dtype=self.dtype, name="convN_1",
        )(f_in, deterministic)

        out = nn.Conv(1, (1, 1), dtype=self.dtype, name="final")(f_out)
        return out.astype(jnp.float32)
