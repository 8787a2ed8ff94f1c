"""Stand-in for the ``rotary_embedding_torch`` package (not installed).

The reference Merizo imports lucidrains' RotaryEmbedding
(modules/merizo/model/ipa/nndef_ipa.py:5,110) — this stub implements the
same public call used there (``rotate_queries_or_keys`` with the default
``seq_dim=-2``, interleaved GPT-J pairing, theta=10000) so the torch
network can run as a parity oracle.  mica_tpu.models.merizo implements
identical semantics on the jax side (rotary_rotate_heads).
"""

import torch


class RotaryEmbedding(torch.nn.Module):
    def __init__(self, dim, theta=10000):
        super().__init__()
        self.dim = dim
        inv_freq = 1.0 / (
            theta ** (torch.arange(0, dim, 2).float() / dim)
        )
        self.register_buffer("inv_freq", inv_freq)

    def rotate_queries_or_keys(self, t, seq_dim=-2):
        seq_len = t.shape[seq_dim]
        pos = torch.arange(seq_len, dtype=self.inv_freq.dtype,
                           device=t.device)
        freqs = torch.einsum("i,j->ij", pos, self.inv_freq)  # (S, dim/2)
        freqs = torch.repeat_interleave(freqs, 2, dim=-1)     # (S, dim)
        # broadcast freqs over leading dims; seq axis is -2 of t
        cos, sin = freqs.cos(), freqs.sin()
        rot_dim = freqs.shape[-1]
        x, x_pass = t[..., :rot_dim], t[..., rot_dim:]
        x2 = x.reshape(*x.shape[:-1], rot_dim // 2, 2)
        rot_half = torch.stack((-x2[..., 1], x2[..., 0]), dim=-1).reshape(
            *x.shape
        )
        x = x * cos + rot_half * sin
        return torch.cat((x, x_pass), dim=-1)
