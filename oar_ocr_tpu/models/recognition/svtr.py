"""CTC text recognizer: PP-LCNetV3 backbone + SVTR mixer neck + CTC head.

TPU-native counterpart of the reference's CRNNModel (oar-ocr-core/src/
models/recognition/crnn.rs:33-258 — which covers PP-OCRv3–v6 / SVTRv2 /
RepSVTR CTC recognizers as ONNX graphs). Deployed PP-OCRv4/v5 mobile rec
topology: LCNet trunk collapsing the 48-px height, Im2Seq, a small stack of
global-attention SVTR mixing blocks, then a linear CTC projection with
softmax (the ONNX models emit probabilities, which decode.rs consumes).

The (B, T, vocab) probabilities never leave the device: ops/ctc.py fuses
greedy decode into the same jit (cf. infer_first_output_f32's zero-copy
motivation, ort_infer_execution.rs:224-231).
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones import PPLCNetV3
from ..layers import TransformerBlock


class SVTREncoder(nn.Module):
    """Im2Seq + SVTR global mixing blocks (EncoderWithSVTR)."""

    dim: int = 120
    depth: int = 2
    num_heads: int = 8

    @nn.compact
    def __call__(self, x):
        # x: (N, T, C) sequence from the collapsed backbone
        x = nn.Dense(self.dim, dtype=x.dtype)(x)
        for _ in range(self.depth):
            x = TransformerBlock(self.num_heads)(x)
        return nn.LayerNorm(dtype=x.dtype)(x)


class SVTRRecognizer(nn.Module):
    """Input: (N, 48, W, 3) normalized crops (W a bucket multiple of 8).
    Output: (N, W//8, vocab) post-softmax probabilities, blank at index 0."""

    vocab_size: int
    backbone_scale: float = 0.95
    svtr_dim: int = 120
    svtr_depth: int = 2
    backbone: str = "lcnet"            # lcnet (mobile) | hgnet (server)

    @nn.compact
    def __call__(self, x):
        if self.backbone == "hgnet":
            from ..hgnet import PPHGNetV2

            seq = PPHGNetV2(mode="rec")(x)
        else:
            seq = PPLCNetV3(scale=self.backbone_scale, mode="rec")(x)  # (N,T,C)
        seq = SVTREncoder(self.svtr_dim, self.svtr_depth)(seq)
        logits = nn.Dense(self.vocab_size, dtype=seq.dtype)(seq)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
