"""Diff the optimized HLO of the chunk loop with targets as constants vs
runtime arguments: op histograms of the while body, to locate the ~12 ms
per-step delta."""
import re
import sys
from collections import Counter

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import TransferJob, _make_pyramid_loss
from artstyletransfer_tpu.utils.image import load_image

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    cfg = Config(levels_num=3, base_diameter=256, optimizer="adam",
                 iters_num=100, stream_every=50, compute_dtype=dtype)
    content, style = load_image(CONTENT), load_image(STYLE)
    job = TransferJob(content, style, cfg)
    loss_fn = _make_pyramid_loss(list(job.level_shapes), cfg)
    params, targets = job.params, job.targets
    x0 = jnp.asarray(job._x0, copy=True)
    opt = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    opt0 = opt.init(x0)

    def scalar_loss(p, t, x):
        total, _ = loss_fn(p, t, x)
        return total

    vgrad = jax.value_and_grad(scalar_loss, argnums=2)

    def body_for(p, t):
        def body(i, carry):
            x, o, _ = carry
            f, g = vgrad(p, t, x)
            upd, o = opt.update(g, o)
            lr = cfg.lr_start * jnp.power(jnp.float32(cfg.lr_decay),
                                          i.astype(jnp.float32) + 1.0)
            return x - lr * upd, o, f
        return body

    n = 50

    @jax.jit
    def f_arg(t, x, o):
        return jax.lax.fori_loop(0, n, body_for(params, t),
                                 (x, o, jnp.float32(0.0)))

    @jax.jit
    def f_const(x, o):
        return jax.lax.fori_loop(0, n, body_for(params, targets),
                                 (x, o, jnp.float32(0.0)))

    def body_ops(txt):
        # whole-module op histogram (the while body IS ~the whole module
        # for this graph); shape sizes from the result type on each line
        ops = Counter()
        bytes_by_op = Counter()
        for line in txt.splitlines():
            m = re.search(r"=\s+(?:\([^)]*\)|\S+)\s+([a-z][a-z0-9-]*)\(",
                          line)
            if not m:
                continue
            op = m.group(1)
            ops[op] += 1
            sm = re.findall(r"(bf16|f32|s32|pred|u32)\[([\d,]*)\]", line)
            if sm:
                d, shp = sm[0]
                sz = 1
                for t_ in shp.split(","):
                    if t_:
                        sz *= int(t_)
                bpe = {"bf16": 2, "f32": 4, "s32": 4, "u32": 4,
                       "pred": 1}[d]
                bytes_by_op[op] += sz * bpe
        return ops, bytes_by_op

    for name, comp in (("ARG", f_arg.lower(targets, x0, opt0).compile()),
                       ("CONST", f_const.lower(x0, opt0).compile())):
        txt = comp.as_text()
        ops, byts = body_ops(txt)
        print(f"=== {name}: while-body op histogram ===")
        for op, c in ops.most_common(15):
            print(f"  {op:22s} {c:5d}  out-bytes {byts[op]/1e6:8.1f} MB")
        with open(f"/tmp/hlo_{name.lower()}.txt", "w") as fh:
            fh.write(txt)
    print("full HLO in /tmp/hlo_arg.txt /tmp/hlo_const.txt")


if __name__ == "__main__":
    main()
