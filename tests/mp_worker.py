"""Worker process for the 2-process jax.distributed smoke test.

Run by tests/test_multiprocess.py as:
    python tests/mp_worker.py <pid> <nproc> <port>

Each process owns 2 virtual CPU devices (4 global). The worker joins the
process group through parallel/multihost.py, builds the (dcn, data, model)
mesh, shards a tiny model TP=2 with the batch split across the dcn axis,
runs one real prefill step, and checks its addressable output shards
against a locally computed unsharded reference. Capability parity with the
reference's 2-node DistLLM path (flood/facade/dist_llm.py:198-276), minus
pickled activation transport (GSPMD moves the bytes)."""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    # optional TP width (argv[4], default 2). tp > devices-per-process makes
    # the model axis SPAN processes — with 4 procs x 2 devices and tp=4 the
    # mesh is (dcn=2, data=1, model=4): a real dcn axis >= 2 with
    # cross-process model collectives (round-4 review #6)
    tp = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    from painlessinferenceacceleration_tpu.parallel.multihost import (
        host_local_batch_to_global,
        initialize_multihost,
        make_multihost_mesh,
    )

    initialize_multihost(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    from painlessinferenceacceleration_tpu.config import (
        EngineConfig,
        ModelConfig,
    )
    from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
    from painlessinferenceacceleration_tpu.engine.step import prefill_step
    from painlessinferenceacceleration_tpu.models.base import init_params
    from painlessinferenceacceleration_tpu.parallel.mesh import (
        kv_shardings,
        param_shardings,
    )

    cfg = ModelConfig.tiny()
    ecfg = EngineConfig(page_size=16, max_seq_len=64, max_concurrency=2)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    # numpy snapshot: prefill_step donates the kv arena, so the reference
    # call would delete the arrays before the sharded run re-places them
    kv_np = {
        k: np.asarray(v)
        for k, v in init_kv_cache(cfg, ecfg, dtype=jnp.float32).items()
    }
    kv = {k: jnp.asarray(v) for k, v in kv_np.items()}

    # ---- unsharded local reference (this process's devices only) ----
    rng = np.random.default_rng(0)
    B, T = 2, 12
    toks = rng.integers(5, cfg.vocab_size - 5, size=(B, T)).astype(np.int32)
    P_req = ecfg.pages_per_req
    pt = (
        np.arange(1, 1 + B * P_req, dtype=np.int32).reshape(B, P_req)
    )
    starts = np.zeros((B,), np.int32)
    lens = np.full((B,), T, np.int32)
    _, ref_nxt, ref_logits = prefill_step(
        params, kv, cfg, jnp.asarray(toks), jnp.asarray(starts),
        jnp.asarray(lens), jnp.asarray(pt),
    )
    ref_nxt = np.asarray(ref_nxt)
    ref_logits = np.asarray(ref_logits)

    # ---- global sharded run: TP on 'model', batch split on 'dcn' ----
    mesh = make_multihost_mesh(tp=tp)
    exp_dcn = (2 * nproc) // (tp * mesh.shape["data"])
    assert mesh.shape["model"] == tp and mesh.shape["dcn"] == exp_dcn, (
        dict(mesh.shape), tp, exp_dcn,
    )

    pspecs = param_shardings(cfg, mesh, params)
    gparams = jax.tree.map(
        lambda x, s: host_local_batch_to_global(mesh, s, np.asarray(x)),
        params, pspecs,
        is_leaf=lambda x: hasattr(x, "shape"),
    )
    kspecs = kv_shardings(cfg, mesh, kv_np)
    gkv = {
        k: host_local_batch_to_global(mesh, kspecs[k], v)
        for k, v in kv_np.items()
    }
    bspec = P("dcn")
    gtoks = host_local_batch_to_global(mesh, bspec, toks)
    gstarts = host_local_batch_to_global(mesh, bspec, starts)
    glens = host_local_batch_to_global(mesh, bspec, lens)
    gpt = host_local_batch_to_global(mesh, bspec, pt)

    gkv2, gnxt, glogits = prefill_step(
        gparams, gkv, cfg, gtoks, gstarts, glens, gpt
    )

    # every process checks the output rows its devices hold
    checked = 0
    for sh in gnxt.addressable_shards:
        got = np.asarray(sh.data)
        want = ref_nxt[sh.index]
        np.testing.assert_array_equal(got, want)
        checked += got.size
    for sh in glogits.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(sh.data), ref_logits[sh.index], rtol=2e-4, atol=2e-4
        )
    assert checked > 0

    # ---- one tree-VERIFY step over the same global mesh ----
    from painlessinferenceacceleration_tpu.engine.step import verify_step

    Q = 5
    toks = np.tile(np.arange(3, 3 + Q, dtype=np.int32)[None], (B, 1))
    toks[:, 0] = ref_nxt
    posv = T + np.tile(np.arange(Q, dtype=np.int32)[None], (B, 1))
    qmv = np.tril(np.ones((Q, Q), bool))[None].repeat(B, 0)
    parv = np.tile(np.arange(-1, Q - 1, dtype=np.int32)[None], (B, 1))
    gkv3, gout, gacc = verify_step(
        gparams, gkv2, cfg,
        host_local_batch_to_global(mesh, bspec, toks),
        host_local_batch_to_global(mesh, bspec, posv),
        host_local_batch_to_global(mesh, P("dcn"), qmv),
        host_local_batch_to_global(mesh, bspec, parv),
        gpt,
        host_local_batch_to_global(mesh, bspec, np.full((B,), T, np.int32)),
        host_local_batch_to_global(mesh, bspec, np.ones((B,), bool)),
    )
    for sh in gacc.addressable_shards:
        assert np.asarray(sh.data).min() >= 1  # at least the bonus token

    # ---- full engine loop across processes: DistLLM(multihost=True)
    # .generate() end-to-end (scheduler + multistep bursts + spec verify).
    # The reference runs a bespoke rank>0 recv/forward loop
    # (dist_llm.py:247-276); here every process runs the SAME deterministic
    # scheduler, so the jitted step sequences stay in lockstep and XLA
    # moves all data. Tokens must be identical to the single-process LLM.
    from painlessinferenceacceleration_tpu.engine.dist_llm import DistLLM
    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import (
        SamplingParams,
    )

    ecfg2 = EngineConfig(
        page_size=16, max_seq_len=128, max_concurrency=4, eos_token_id=-2,
        use_lookahead=True, decoding_length=8, branch_length=4,
        decode_burst=2, decode_burst_idle=4,
    )
    prompts = [[5, 6, 7, 8], [9, 10, 11], [3, 4, 5, 6, 7]]
    sp = SamplingParams(max_new_tokens=12)
    sl = LLM(cfg=cfg, params=params, ecfg=ecfg2, dtype=jnp.float32)
    expect = [o.output_ids for o in sl.generate(prompts, sp)]
    dl = DistLLM(
        cfg=cfg, params=params, ecfg=ecfg2, dtype=jnp.float32,
        mesh_shape=(1, tp), multihost=True,
    )
    assert dl.mesh.shape["model"] == tp and dl.mesh.shape["dcn"] == exp_dcn
    got = [o.output_ids for o in dl.generate(prompts, sp)]
    assert got == expect, (got, expect)
    assert dl.metrics.spec_steps > 0  # the spec path actually ran

    # sampled path across processes: counter-mode per-request seeds must
    # reproduce the single-process stream exactly (both engines carry the
    # same warm table state from the greedy pass, in the same order)
    sp2 = SamplingParams(max_new_tokens=10, temperature=0.8, top_k=8, seed=11)
    expect2 = [o.output_ids for o in sl.generate(prompts, sp2)]
    got2 = [o.output_ids for o in dl.generate(prompts, sp2)]
    assert got2 == expect2, (got2, expect2)

    print(f"MP_OK pid={pid} tokens={ref_nxt.tolist()}", flush=True)


if __name__ == "__main__":
    main()
