"""Collective-traffic audit for the width-sharded SPADE decoder prototype.

Compiles the decoder under ``parallel.spatial.spatial_sharding`` on the
N-virtual-device CPU mesh (GSPMD partitioning is platform-independent — the
collective schedule is what a TPU mesh would run; only the timings differ)
and reports, per forward pass:

  * counts of each collective op in the optimized HLO,
  * total per-device collective bytes (halo slabs + norm-stat all-reduces),
  * the per-device compute share,

which is the data behind the go/no-go note in BASELINE.md ("Decoder spatial
sharding"). Run on CPU; needs no TPU:

    JAX_PLATFORMS=cpu python scripts/spatial_audit.py --nf 16 --devices 8
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nf", type=int, default=16,
                    help="decoder channel_factor (reference BAIR: 64)")
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--data", type=int, default=1,
                    help="data-axis size: >1 audits the DP x spatial "
                    "composition (2-D mesh, batch rows on 'data', width on "
                    "'model' with batch_axis='data' — the facade's "
                    "Model(data_parallel=True, spatial_shard=N) program)")
    a = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={a.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from image2video_synthesis_using_cinns_tpu.models.stage1.decoder import (
        Generator,
    )
    from image2video_synthesis_using_cinns_tpu.parallel.mesh import make_mesh
    from image2video_synthesis_using_cinns_tpu.parallel.spatial import (
        spatial_sharding,
    )

    dec = Generator(channel_factor=a.nf, z_dim=64, upsample_s=(2, 1),
                    upsample_t=(1, 2), spectral_norm=True)
    rng = np.random.default_rng(0)
    bs = a.data  # one row per data-device in the composed audit
    img = jnp.asarray(rng.uniform(-1, 1, (bs, a.img, a.img, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(bs, 64)).astype(np.float32))
    variables = jax.jit(dec.init)({"params": jax.random.PRNGKey(0)}, img[:1], z[:1])

    if a.data > 1:
        if a.devices % a.data:
            raise SystemExit("--data must divide --devices")
        from jax.sharding import Mesh

        n_model = a.devices // a.data
        mesh = Mesh(
            np.asarray(jax.devices()[: a.devices]).reshape(a.data, n_model),
            ("data", "model"),
        )
        in_sh = NamedSharding(mesh, P("data"))
        out_sh = NamedSharding(mesh, P("data", None, None, "model", None))
        batch_axis = "data"
    else:
        mesh = make_mesh(a.devices, "model")
        in_sh = NamedSharding(mesh, P())
        out_sh = NamedSharding(mesh, P(None, None, None, "model", None))
        batch_axis = None
    rep = NamedSharding(mesh, P())

    def fwd(v, img, z):
        with spatial_sharding(mesh, "model", batch_axis=batch_axis):
            return dec.apply(v, img, z)

    f = jax.jit(fwd, in_shardings=(rep, in_sh, in_sh), out_shardings=out_sh)
    compiled = f.lower(variables, img, z).compile()
    txt = compiled.as_text()

    colls = Counter(re.findall(
        r"\b(all-reduce|collective-permute|all-gather|reduce-scatter|"
        r"all-to-all)\b", txt))
    byte_total = 0
    for m in re.finditer(
            r"= (\S+) (all-reduce|collective-permute|all-gather|"
            r"reduce-scatter)\(", txt):
        for dt, dims in re.findall(r"(f32|bf16|f16|u32|s32)\[([\d,]*)\]",
                                   m.group(1)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            byte_total += n * (2 if dt in ("bf16", "f16") else 4)

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"devices={a.devices} nf={a.nf} img={a.img}"
          + (f" data={a.data} model={mesh.shape['model']} bs={bs}"
             if a.data > 1 else ""))
    if a.data > 1 and colls.get("all-gather"):
        print("WARNING: all-gathers present — the composed program is "
              "re-replicating something (batch rows should stay on 'data')")
    print("collective ops:", dict(colls))
    print(f"per-device collective bytes/forward: {byte_total/1e6:.2f} MB")
    print(f"program FLOPs (global): {float(ca.get('flops', 0))/1e9:.1f} GFLOP")
    print(f"per-device FLOPs: {float(ca.get('flops', 0))/a.devices/1e9:.2f} "
          f"GFLOP")


if __name__ == "__main__":
    main()
