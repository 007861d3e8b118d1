"""CTC text recognizer — exact PP-OCRv4/v5 mobile rec topology.

TPU-native counterpart of the reference's CRNNModel (oar-ocr-core/src/
models/recognition/crnn.rs:33-258 — which runs the PP-OCRv3–v6 / SVTRv2 /
RepSVTR CTC recognizers as ONNX graphs). Structure, dimensions and
parameter names mirror PaddleOCR:

- backbone: PPLCNetV3(scale=0.95) rec mode (models/lcnetv3.py) →
  (N, 1, W/8, C) feature map;
- head: MultiHead's inference branch (ppocr/modeling/heads/rec_multi_head
  .py) = ``ctc_encoder`` (SequenceEncoder type 'svtr' wrapping
  EncoderWithSVTR, ppocr/modeling/necks/rnn.py) + ``ctc_head`` (CTCHead
  fc). EncoderWithSVTR: conv1([1,3]) → conv2(1×1→hidden) → depth×SVTR
  global-mixer block → LayerNorm → conv3(1×1→C) → concat(shortcut) →
  conv4([1,3]) → conv1x1(→dims) → Im2Seq;
- deploy models emit post-softmax probabilities (CTCHead inference
  branch), which ops/ctc.py consumes on device.

The (B, T, vocab) probabilities never leave the device: ops/ctc.py fuses
greedy decode into the same jit (cf. infer_first_output_f32's zero-copy
motivation, ort_infer_execution.rs:224-231).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..lcnetv3 import PPLCNetV3


def _pad_hw(kernel: Tuple[int, int]):
    return ((kernel[0] // 2, kernel[0] // 2), (kernel[1] // 2, kernel[1] // 2))


class ConvBNSwish(nn.Module):
    """rnn.py ConvBNLayer: conv (no bias) + BatchNorm2D (name 'norm') +
    swish activation."""

    features: int
    kernel: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, padding=_pad_hw(self.kernel),
                    use_bias=False, dtype=x.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=x.dtype, name="norm")(x)
        return jax.nn.swish(x)


class SVTRAttention(nn.Module):
    """svtrnet.py Attention (Global mixer): qkv Linear (bias), scaled
    dot-product over all tokens, proj Linear."""

    num_heads: int = 8

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=True, dtype=x.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhtd,bhsd->bhts", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, c)
        return nn.Dense(c, use_bias=True, dtype=x.dtype, name="proj")(o)


class SVTRMlp(nn.Module):
    """svtrnet.py Mlp with Swish activation (EncoderWithSVTR passes
    act_layer=Swish)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Dense(self.hidden, dtype=x.dtype, name="fc1")(x)
        h = jax.nn.swish(h)
        return nn.Dense(c, dtype=x.dtype, name="fc2")(h)


class SVTRBlock(nn.Module):
    """svtrnet.py Block with prenorm=False (the EncoderWithSVTR setting):
    x += mixer(norm1(x)); x += mlp(norm2(x))."""

    num_heads: int = 8
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = x + SVTRAttention(self.num_heads, name="mixer")(
            nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name="norm1")(x))
        x = x + SVTRMlp(int(c * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name="norm2")(x))
        return x


class EncoderWithSVTR(nn.Module):
    """rnn.py EncoderWithSVTR — the v4/v5 mobile rec neck
    (dims=120, depth=2, hidden_dims=120, kernel_size=[1,3],
    use_guide=True; guide only stops gradients, a no-op at inference)."""

    dims: int = 120
    depth: int = 2
    hidden_dims: int = 120
    num_heads: int = 8
    mlp_ratio: float = 2.0
    kernel: Tuple[int, int] = (1, 3)

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, C)
        c_in = x.shape[-1]
        h = x
        z = ConvBNSwish(c_in // 8, self.kernel, name="conv1")(x)
        z = ConvBNSwish(self.hidden_dims, (1, 1), name="conv2")(z)
        n, hh, ww, cc = z.shape
        z = z.reshape(n, hh * ww, cc)
        for i in range(self.depth):
            z = SVTRBlock(self.num_heads, self.mlp_ratio,
                          name=f"svtr_block.{i}")(z)
        z = nn.LayerNorm(epsilon=1e-6, dtype=z.dtype, name="norm")(z)
        z = z.reshape(n, hh, ww, cc)
        z = ConvBNSwish(c_in, (1, 1), name="conv3")(z)
        z = jnp.concatenate([h, z], axis=-1)
        z = ConvBNSwish(c_in // 8, self.kernel, name="conv4")(z)
        return ConvBNSwish(self.dims, (1, 1), name="conv1x1")(z)


class CTCHead(nn.Module):
    """rec_ctc_head.py CTCHead (no mid_channels): fc → softmax at
    inference."""

    vocab_size: int

    @nn.compact
    def __call__(self, x):
        logits = nn.Dense(self.vocab_size, dtype=x.dtype, name="fc")(x)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


class MultiHeadCTC(nn.Module):
    """rec_multi_head.py MultiHead, inference branch only (the NRTR/GTC
    head exists only at training time and is absent from deploy
    exports)."""

    vocab_size: int
    svtr_dims: int = 120
    svtr_depth: int = 2
    svtr_hidden: int = 120

    @nn.compact
    def __call__(self, x):
        # x: (N, 1, T, C)
        z = EncoderWithSVTR(self.svtr_dims, self.svtr_depth,
                            self.svtr_hidden,
                            name="ctc_encoder.encoder")(x)
        n, hh, ww, cc = z.shape
        seq = z.reshape(n, hh * ww, cc)          # Im2Seq (H == 1)
        return CTCHead(self.vocab_size, name="ctc_head")(seq)


class SVTRRecognizer(nn.Module):
    """Input: (N, 48, W, 3) normalized crops (W a bucket multiple of 8).
    Output: (N, W//8, vocab) post-softmax probabilities, blank at index 0.

    ``backbone``: "lcnet" (PP-OCRv4/v5 mobile — PPLCNetV3 scale 0.95) or
    "hgnet" (server — PP-HGNetV2)."""

    vocab_size: int
    backbone_scale: float = 0.95
    svtr_dim: int = 120
    svtr_depth: int = 2
    backbone: str = "lcnet"            # lcnet (mobile) | hgnet (server)

    @nn.compact
    def __call__(self, x):
        if self.backbone == "hgnet":
            from ..hgnet import PPHGNetV2

            feat = PPHGNetV2(mode="rec", name="backbone")(x)
            if feat.ndim == 3:               # (N, T, C) → (N, 1, T, C)
                feat = feat[:, None]
        else:
            feat = PPLCNetV3(scale=self.backbone_scale, mode="rec",
                             name="backbone")(x)
        return MultiHeadCTC(self.vocab_size, self.svtr_dim, self.svtr_depth,
                            name="head")(feat)
