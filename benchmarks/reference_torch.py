"""Torch replica of the reference compute profile, for baseline measurement.

The reference repo publishes no throughput numbers (BASELINE.md), and its
exact dependency set (timm 0.4.12 / tensorly / avalanche) is not installed
here — so this module re-creates the reference's *computational profile* in
plain torch for timing purposes only: a ViT-B/16 forward where every block
**materializes the dense CP delta tensors from their factors on each call**
and runs the extra delta GEMMs, exactly the work pattern of the reference hot
loop (``src/cara/cara.py:27-35,52-57,76-92``), with AdamW over the CP + head
parameters.

This is a measurement harness, not part of the framework.
"""

from __future__ import annotations

import time


def measure_reference(batch_size: int = 16, steps: int = 2,
                      rank: int = 8, depth: int = 12, dim: int = 768,
                      heads: int = 12, img: int = 224, patch: int = 16):
    import torch as th
    import torch.nn as nn
    import torch.nn.functional as F

    th.manual_seed(0)
    n_tokens = (img // patch) ** 2 + 1
    dh = dim // heads
    hid = dim * 4

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = nn.LayerNorm(dim, eps=1e-6)
            self.qkv = nn.Linear(dim, 3 * dim)
            self.proj = nn.Linear(dim, dim)
            self.ln2 = nn.LayerNorm(dim, eps=1e-6)
            self.fc1 = nn.Linear(dim, hid)
            self.fc2 = nn.Linear(hid, dim)
            self.dp = nn.Dropout(0.1)

    class RefCara(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Conv2d(3, dim, patch, patch)
            self.cls = nn.Parameter(th.zeros(1, 1, dim))
            self.pos = nn.Parameter(th.zeros(1, n_tokens, dim))
            self.blocks = nn.ModuleList([Block() for _ in range(depth)])
            self.norm = nn.LayerNorm(dim, eps=1e-6)
            self.head = nn.Linear(dim, 100)
            # Global CP tensors (shapes per cara.py:112-125).
            self.A1 = nn.Parameter(th.randn(3 * depth, rank) * 0.1)
            self.A2 = nn.Parameter(th.zeros(dim, rank))
            self.A3 = nn.Parameter(th.randn(heads, rank) * 0.1)
            self.A4 = nn.Parameter(th.randn(dh, rank) * 0.1)
            self.P1 = nn.Parameter(th.randn(9 * depth, rank) * 0.1)
            self.P2 = nn.Parameter(th.zeros(dim, rank))
            self.P3 = nn.Parameter(th.randn(dim, rank) * 0.1)
            self.R1 = nn.Parameter(th.ones(rank))
            self.R2 = nn.Parameter(th.ones(rank))
            self.b1 = nn.Parameter(th.zeros(dim))
            self.b2 = nn.Parameter(th.zeros(hid))
            self.b3 = nn.Parameter(th.zeros(dim))

        def forward(self, x):
            b = x.shape[0]
            x = self.embed(x).flatten(2).transpose(1, 2)
            x = th.cat([self.cls.expand(b, -1, -1), x], dim=1) + self.pos
            for li, blk in enumerate(self.blocks):
                h = blk.ln1(x)
                qkv = blk.qkv(h)
                # Materialize the dense 4-way delta every call (cara.py:27-34).
                f1 = self.A1[3 * li:3 * li + 3]
                t = th.einsum("r,kr,er,hr,dr->kehd",
                              self.R1, f1, self.A2, self.A3, self.A4)
                t = t.reshape(3, dim, dim)
                delta = th.einsum("bne,keo->bnko", h, blk.dp(t))
                qkv = qkv.reshape(b, -1, 3, heads, dh) \
                    + delta.reshape(b, -1, 3, heads, dh)
                q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
                a = (q @ k.transpose(-2, -1)) * dh ** -0.5
                a = a.softmax(-1)
                o = (a @ v).transpose(1, 2).reshape(b, -1, dim)
                proj = blk.proj(o)
                p1 = self.P1[9 * li:9 * li + 1]
                t2 = th.einsum("r,ir,er,fr->ief", self.R2, p1, self.P2, self.P3)
                t2 = t2.reshape(dim, dim)
                proj = proj + o @ blk.dp(t2.T) + self.b1
                x = x + proj
                h2 = blk.ln2(x)
                up = blk.fc1(h2)
                p1u = self.P1[9 * li + 1:9 * li + 5]
                tu = th.einsum("r,ir,er,fr->ief", self.R2, p1u, self.P2,
                               self.P3).reshape(hid, dim)
                up = up + h2 @ blk.dp(tu.T) + self.b2
                act = F.gelu(up)
                down = blk.fc2(act)
                p1d = self.P1[9 * li + 5:9 * li + 9]
                td = th.einsum("r,ir,er,fr->ief", self.R2, p1d, self.P2,
                               self.P3).reshape(hid, dim)
                down = down + act @ blk.dp(td) + self.b3
                x = x + down
            return self.head(self.norm(x)[:, 0])

    model = RefCara()
    trainable = []
    cp_names = ("A1", "A2", "A3", "A4", "P1", "P2", "P3", "R1", "R2",
                "b1", "b2", "b3")
    for n, p in model.named_parameters():
        if n.split(".")[0] in cp_names or n.startswith("head"):
            trainable.append(p)
        else:
            p.requires_grad_(False)
    opt = th.optim.AdamW(trainable, lr=1e-3, weight_decay=1e-4)

    x = th.randn(batch_size, 3, img, img)
    y = th.randint(0, 100, (batch_size,))

    def step():
        out = model(x)
        loss = F.cross_entropy(out, y)
        opt.zero_grad()
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


if __name__ == "__main__":
    print(measure_reference())
