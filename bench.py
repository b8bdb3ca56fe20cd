"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (round 2+): DECODE throughput of the `tpu`-profile serving path --
the BASELINE.json north star (">= 50 Mpix/s/chip"). A batch of 8 kodim14
payloads (real latents, real quantized networks, 512x768 hop architecture)
is decoded by the fully on-device pipeline (bitstream/device_decode.py:
Pallas wavefront kernels + on-device IFCE + vmapped float tail), verified
bit-exact against the host C++ decoder, and timed with fetch-synced
pipelined calls (the axon remote backend's block_until_ready does not
wait, so a device->host fetch is the only true barrier).

Baseline: the reference PyTorch decoder (this host, 2 CPU threads, via
tools/ref_shims) decodes kodim14 in 3.03 s = 0.130 Mpix/s.

`extra` carries the round-1 encode metric (training-loop it/s on the hop
512x768 config vs the reference's 0.51 it/s on this host's CPU) so both
axes stay tracked. First run on a fresh machine pays remote XLA compiles;
they persist in .jax_cache.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# Reference decoder (torch 2.13 CPU, 2 threads, this host) on kodim14.cool:
# 3.03 s for 0.393 Mpix.
BASELINE_REF_DECODE_MPIX_S = 0.130
# Reference trainer (same host), hop 512x768, full fwd/bwd/step: 1.96 s/iter.
BASELINE_REF_CPU_IT_PER_SEC = 0.51

N_DECODE_IMAGES = 8
N_DECODE_REPS = 5
N_TIMED_ITERS = 100
N_TIMED_WINDOWS = 3

KODIM14 = "/root/reference/samples/bitstreams/kodim14.cool"


def bench_decode() -> dict:
    from coolchic_tpu.bitstream import codec
    from coolchic_tpu.bitstream.device_decode import prepare_batch
    from coolchic_tpu.bitstream.headers import CoolChicHeader, FrameHeader, VideoHeader
    from coolchic_tpu.bitstream.nncodec import decode_network

    raw = open(KODIM14, "rb").read()
    _, rest = VideoHeader.read(raw)
    _, rest = FrameHeader.read(rest)
    ch, rest = CoolChicHeader.read(rest)
    cfg = ch.to_config()
    bytes_nn = rest[:ch.nn_n_bytes]
    bytes_latent = rest[ch.nn_n_bytes:ch.nn_n_bytes + ch.n_bytes_latent]
    nn = decode_network(bytes_nn, cfg, ch.nn_q_step_shift, ch.nn_expgol_cnt,
                        ch.nn_n_bit_pad)
    _, grids_ref = codec.decode_coolchic(ch, bytes_nn, bytes_latent, profile="ref")
    payload = codec.encode_coolchic_latents(
        ch, nn, [np.asarray(g, np.int64) for g in grids_ref], profile="tpu")

    n = N_DECODE_IMAGES
    batch = prepare_batch([(ch, bytes_nn, payload)] * n)
    n_pix = n * cfg.img_size[0] * cfg.img_size[1]

    def sync(x):
        return np.asarray(jax.device_get(x[:1, :1, :1, :4]))

    raw_out, grids = batch.run()
    sync(raw_out)

    # bit-exactness gate vs the host C++ decode. Full grids are too slow to
    # fetch over the tunnel (d2h ~2 MB/s), so compare two wrapped-int32
    # checksums per grid computed ON DEVICE (sum and iota-weighted sum);
    # tests/test_device_decode.py holds the full element-wise proof.
    for lvl, g in enumerate(grids):
        want = np.asarray(grids_ref[lvl]).astype(np.int32)
        iota = np.arange(want.size, dtype=np.int32).reshape(want.shape)
        with np.errstate(over="ignore"):
            want_s = np.add.reduce(want.reshape(-1), dtype=np.int32)
            want_m = np.add.reduce((want * iota).reshape(-1), dtype=np.int32)
        gi = g.astype(jnp.int32)
        got_s = np.asarray(jax.device_get(jnp.sum(gi, axis=(1, 2))))
        got_m = np.asarray(jax.device_get(
            jnp.sum(gi * jnp.asarray(iota)[None], axis=(1, 2))))
        assert np.all(got_s == want_s) and np.all(got_m == want_m), \
            f"level {lvl} checksum mismatch"

    t0 = time.time()
    sync(raw_out)
    t_sync = time.time() - t0

    single = float("inf")
    for _ in range(N_DECODE_REPS):
        t0 = time.time()
        raw_out, grids = batch.run()
        sync(raw_out)
        single = min(single, time.time() - t0)

    k = max(N_DECODE_REPS, 5)
    t0 = time.time()
    for _ in range(k):
        raw_out, grids = batch.run()
    sync(raw_out)
    pipelined = (time.time() - t0 - t_sync) / k

    return {
        "mpix_per_s": n_pix / pipelined / 1e6,
        "single_batch_ms": single * 1e3,
        "pipelined_batch_ms": pipelined * 1e3,
        "n_images": n,
        "bit_exact": True,
    }


def bench_ref_profile_decode(n_images: int = 8) -> dict:
    """Host C++ decode of REFERENCE-profile bitstreams (the serial
    constriction stream nothing can vectorize -- docs/tpu_profile.md), single
    core vs all cores: ctypes releases the GIL during the whole-grid C++
    calls, so a thread pool over images scales with the host's cores
    (VERDICT r2 weak #6: report the honest reference-compat figure)."""
    from concurrent.futures import ThreadPoolExecutor

    from coolchic_tpu.bitstream import codec
    from coolchic_tpu.bitstream.headers import CoolChicHeader, FrameHeader, VideoHeader

    raw = open(KODIM14, "rb").read()
    _, rest = VideoHeader.read(raw)
    _, rest = FrameHeader.read(rest)
    ch, rest = CoolChicHeader.read(rest)
    cfg = ch.to_config()
    bytes_nn = rest[:ch.nn_n_bytes]
    bytes_latent = rest[ch.nn_n_bytes:ch.nn_n_bytes + ch.n_bytes_latent]
    mpix = cfg.img_size[0] * cfg.img_size[1] / 1e6

    def one(_):
        codec.decode_coolchic(ch, bytes_nn, bytes_latent, profile="ref")

    t0 = time.time()
    one(0)
    t_1 = time.time() - t0

    n_thr = os.cpu_count() or 1
    t0 = time.time()
    with ThreadPoolExecutor(n_thr) as ex:
        list(ex.map(one, range(n_images)))
    t_n = (time.time() - t0) / n_images
    return {"mpix_per_s_1core": mpix / t_1,
            "mpix_per_s_multicore": mpix / t_n, "n_threads": n_thr}


def bench_encode() -> dict:
    from coolchic_tpu.models.frame import FrameConfig, frame_encoder_init
    from coolchic_tpu.train.presets import TrainerPhase
    from coolchic_tpu.train.train import _make_fns, init_opt_state
    from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args

    img_size = (512, 768)
    cfgs = {"residue": coolchic_config_from_args(INTRA_OPERATING_POINTS["hop"], img_size)}
    fcfg = FrameConfig(coolchic_cfg=cfgs)
    phase = TrainerPhase(lmbda=1e-3, max_itr=N_TIMED_ITERS, freq_valid=N_TIMED_ITERS,
                         quantizer_noise_type="gaussian", quantizer_type="softround")

    key = jax.random.PRNGKey(0)
    params = frame_encoder_init(key, fcfg)
    target = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, *img_size), dtype=jnp.float32)

    fns = _make_fns(
        fcfg, phase.quantizer_noise_type, phase.quantizer_type,
        tuple(sorted(phase.dist_weight.items())), phase.lmbda,
        tuple(phase.betas_model), tuple(phase.betas_latent),
        phase.precondition_frequency_model, phase.freq_valid, False)
    train_window = fns["train_window"]
    opt_state = init_opt_state(params, fns["hp_weight"], fns["hp_latent"])

    def fetch(tree):
        return float(np.asarray(tree["residue"]["latents"][0]).ravel()[0])

    p, o, k = params, opt_state, key
    p, o, k = train_window(p, o, k, jnp.float32(1e-2), jnp.float32(0.3),
                           jnp.float32(0.2), target, None, None,
                           length=N_TIMED_ITERS)
    fetch(p)

    dt = float("inf")
    for _ in range(N_TIMED_WINDOWS):
        t0 = time.time()
        p, o, k = train_window(p, o, k, jnp.float32(1e-2), jnp.float32(0.3),
                               jnp.float32(0.2), target, None, None,
                               length=N_TIMED_ITERS)
        fetch(p)
        dt = min(dt, time.time() - t0)

    return {"it_per_s": N_TIMED_ITERS / dt}


# Reference FULL encode per image at the same recipe (hop 512x768,
# n_itr=3000, NN quantize + RDOQ), MEASURED on this host from the
# reference's own runs (results/round4/ref/kodim14full_l{4e-3,2e-2}):
#   l=4e-3: time_sec 11163.0 (training) + 283.9 quantize + 772.0 rdoq
#   l=2e-2: time_sec  6711.3 (training) + 296.2 quantize + 804.1 rdoq
# -> mean 10015 s/image. The former 4900 s figure was an estimate
# (2350 its / 0.51 it/s + ~300 s tail) that undercounted both the
# reference's real iteration count under early stopping and its RDOQ cost;
# it is kept as a conservative secondary multiple in the bench extras.
BASELINE_REF_CPU_FULL_ENCODE_S = 10015.0
BASELINE_REF_CPU_FULL_ENCODE_EST_S = 4900.0


def bench_full_encode(n_images: int = 3, n_itr: int = 2000) -> dict:
    """End-to-end batched encode throughput: warm-up tournament + training +
    NN quantization + RDOQ + bitstream write for a batch of distinct
    512x768 images as one program (parallel/encode_batch.py). Skippable with
    COOLCHIC_BENCH_FULL=0 (the decode headline stays the driver metric)."""
    import tempfile

    from samples.encode_kodak_batch import build_kodak_targets
    from coolchic_tpu.parallel.encode_batch import encode_images_batched
    from coolchic_tpu.train.presets import PresetIntra
    from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args

    frames, _ = build_kodak_targets(n_images)
    h, w = frames[0].img_size
    cfgs = {"residue": coolchic_config_from_args(INTRA_OPERATING_POINTS["hop"], (h, w))}
    preset = PresetIntra(lmbda=1e-3, start_lr=1e-2, itr_main_training=n_itr)
    with tempfile.TemporaryDirectory() as td:
        outs = [os.path.join(td, f"b{i}.cool") for i in range(n_images)]
        t0 = time.time()
        res = encode_images_batched(frames, cfgs, preset, outs, verbose=False)
        dt = time.time() - t0
    return {
        "img_per_s": n_images / dt,
        "s_per_img": dt / n_images,
        "psnr_db": sum(r["psnr_db"] for r in res) / n_images,
        "rate_bpp": sum(r["rate_bpp"] for r in res) / n_images,
        "n_itr": n_itr,
    }


def host_extras(extra: dict) -> dict:
    """Host-only extras (TSV statistics + BD-rates): no TPU touched, so they
    are testable any time with `python bench.py --extras-only`."""
    # Full-encode throughput is MEASURED in-round on this chip from the
    # round-3 Kodak pair-sweep chunks (results/round3/kodak/
    # image-kodak-batch.tsv: batched 512x768 hop encodes at batch 6,
    # n_itr=3000, incl. warm-up + training + NN quantize + RDOQ + bitstream,
    # compile-free steady-state chunks). A live re-run stays OPT-IN
    # (COOLCHIC_BENCH_FULL=1) to keep the driver bench bounded.
    try:
        import csv
        import statistics

        here = os.path.dirname(os.path.abspath(__file__))
        # The round-4/5 512x768 WITH-RDOQ pair sweep is ONE logical run: its
        # first chunk (gain 24, lambda=1e-4) completed in round 4, the rest
        # in round 5 (results/round5/kodak/run.log). Rows concatenate in run
        # order. Falls back to older rounds on partial checkouts.
        paths = [os.path.join(here, p) for p in (
            "results/round4/kodak/image-kodak-batch.tsv",
            "results/round5/kodak/image-kodak-batch.tsv")]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            paths = [os.path.join(here,
                                  "results/round3/kodak/image-kodak-batch.tsv")]
        rows = []
        contributed = set()
        for tsv in paths:
            with open(tsv) as f:
                file_rows = list(csv.DictReader(f, delimiter="\t"))
            if file_rows:
                contributed.add("r5" if "round5" in tsv else
                                ("r4" if "round4" in tsv else "r3"))
            rows.extend(file_rows)
        # label by the NEWEST round that actually contributed rows
        rnd = max(contributed) if contributed else "r0"
        # One throughput sample per CHUNK (rows of a chunk share chunk_s,
        # written at 0.1 s precision -- img_per_s_chunk's 4 decimals can
        # collide across similar-duration chunks).
        chunks: list[dict] = []
        for r in rows:
            t = float(r["chunk_s"])
            if not chunks or abs(t - chunks[-1]["chunk_s"]) > 1e-9:
                chunks.append({"img_per_s": float(r["img_per_s_chunk"]),
                               "chunk_s": t, "lmbda": float(r["lmbda"])})
        # WARM chunks: drop the first chunk of each encoder-gain group (the
        # lambda-adaptive gain is a static config, so each group's first
        # chunk pays the remote window + RDOQ compiles for that gain).
        from coolchic_tpu.train.video import intra_gain_for_lmbda

        seen_gain = set()
        warm = []
        for c in chunks:
            g = intra_gain_for_lmbda(c["lmbda"])
            if g in seen_gain:
                warm.append(c)
            else:
                seen_gain.add(g)
        if warm:
            steady = statistics.median(c["img_per_s"] for c in warm)
            basis = f"median over {len(warm)} warm (non-group-first) chunks"
            if len(warm) > 1:
                ts = [c["chunk_s"] for c in warm]
                extra["encode_full_warm_chunk_s"] = [round(t, 1) for t in ts]
                extra["encode_full_warm_variance_pct"] = round(
                    100 * (max(ts) - min(ts)) / min(ts), 1)
        elif len(chunks) > 1:
            steady = statistics.median(c["img_per_s"] for c in chunks[1:])
            basis = "median over non-first chunks (no warm chunk yet)"
        else:
            steady = chunks[0]["img_per_s"]
            basis = "FIRST chunk only (compile-laden)"
        extra[f"encode_full_img_per_s_measured_{rnd}"] = round(steady, 5)
        extra[f"encode_full_vs_ref_cpu_measured_{rnd}"] = round(
            steady * BASELINE_REF_CPU_FULL_ENCODE_S, 1)
        extra["encode_full_vs_ref_cpu_est4900"] = round(
            steady * BASELINE_REF_CPU_FULL_ENCODE_EST_S, 1)
        extra["encode_full_note"] = (
            "batch-6 512x768 hop pair-sweep chunks, n_itr=3000, incl "
            "warmup+train+quantize"
            + (" (round-3 sweep ran --no_rdoq)" if rnd == "r3" else "+rdoq")
            + f"+bitstream; {basis} of "
            + ", ".join(p[len(here) + 1:] for p in paths)
            + "; ref baseline 10015 s/img MEASURED from the reference's own "
              "kodim14full hop n_itr=3000 runs on this host "
              "(results/round4/ref/*/run.log + results_encoder.tsv)")
    except Exception as e:
        extra["encode_full_img_per_s_measured_r2"] = 0.00077
        extra["encode_full_note"] = f"sweep TSV unavailable ({e});" \
            " round-2 figure: batch-3, n_itr=2000, incl rdoq tail"
    # RD parity headline: decoder-verified 5-point matched-λ head-to-head vs
    # the live reference encoder (results/round4/README.md §1).
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        from coolchic_tpu.utils.results import bd_rate

        ours = {}
        with open(os.path.join(
                here, "results/round4/h2h_kodim15_v3/results_decoder.tsv")) as f:
            hdr = f.readline().strip().split("\t")
            for ln in f:
                r = dict(zip(hdr, ln.strip().split("\t")))
                ours[float(r["lmbda"])] = (float(r["rate_bpp"]),
                                           float(r["psnr_db_dec"]))
        ref = {}
        for lam_s in ("1e-4", "4e-4", "1e-3", "4e-3", "2e-2"):
            with open(os.path.join(
                    here, f"results/round3/ref/kodim15_l{lam_s}/"
                          "0000-results_decoder.tsv")) as f:
                f.readline()
                _, psnr, bpp = f.readline().split()[:3]
            ref[float(lam_s)] = (float(bpp), float(psnr))
        lams = sorted(set(ours) & set(ref))
        extra["bd_rate_5pt_vs_ref_pct"] = round(bd_rate(
            [ours[l][0] for l in lams], [ours[l][1] for l in lams],
            [ref[l][0] for l in lams], [ref[l][1] for l in lams]), 2)
    except Exception as e:
        extra["bd_rate_error"] = str(e)[:120]
    # Full-size (512x768) matched-lambda head-to-head: ours = the identity
    # slot (kodim14_p012) of the round-4/5 WITH-RDOQ sweep, decoder-verified
    # (results/round5/kodak/results_decoder.tsv); reference = the live
    # reference encoder's decoder-verified kodim14full runs at the SAME
    # lambda / budget (results/round{3,4}/ref/). VERDICT r4 item 1.
    try:
        import sys as _sys

        here = os.path.dirname(os.path.abspath(__file__))
        from coolchic_tpu.utils.results import bd_rate

        if os.path.join(here, "tools") not in _sys.path:
            _sys.path.insert(0, os.path.join(here, "tools"))
        from report_h2h_fullsize import REF_RUNS  # single source of ref runs

        ours = {}
        with open(os.path.join(
                here, "results/round5/kodak/results_decoder.tsv")) as f:
            hdr = f.readline().strip().split("\t")
            for ln in f:
                r = dict(zip(hdr, ln.strip().split("\t")))
                # decode-gate: only decoder-verified rows (ok=1) may feed
                # the headline BD-rate
                if r["seq_name"] == "kodim14_p012" and r.get("ok", "1") == "1":
                    ours[float(r["lmbda"])] = (float(r["rate_bpp"]),
                                               float(r["psnr_db_dec"]))
        ref = {}
        for lam, d in REF_RUNS.items():
            p = os.path.join(here, d, "0000-results_decoder.tsv")
            if not os.path.exists(p):
                continue
            with open(p) as f:
                f.readline()
                _, psnr, bpp = f.readline().split()[:3]
            ref[lam] = (float(bpp), float(psnr))
        lams = sorted(set(ours) & set(ref))
        if len(lams) >= 3:
            extra["bd_rate_fullsize_3pt_vs_ref_pct"] = round(bd_rate(
                [ours[l][0] for l in lams], [ours[l][1] for l in lams],
                [ref[l][0] for l in lams], [ref[l][1] for l in lams]), 2)
            extra["bd_rate_fullsize_lambdas"] = lams
    except Exception as e:
        extra["bd_rate_fullsize_error"] = str(e)[:120]
    return extra


def main():
    dec = bench_decode()
    enc = bench_encode()
    extra = {
        "decode_single_batch_ms": round(dec["single_batch_ms"], 1),
        "decode_bit_exact": dec["bit_exact"],
        "decode_north_star_50mpix": round(dec["mpix_per_s"] / 50.0, 2),
        "encode_train_iter_per_sec_hop_512x768": round(enc["it_per_s"], 3),
        "encode_vs_ref_cpu": round(enc["it_per_s"] / BASELINE_REF_CPU_IT_PER_SEC, 2),
    }
    try:
        refdec = bench_ref_profile_decode()
        extra["decode_ref_profile_mpix_per_s_1core"] = round(
            refdec["mpix_per_s_1core"], 2)
        extra["decode_ref_profile_mpix_per_s_multicore"] = round(
            refdec["mpix_per_s_multicore"], 2)
        extra["decode_ref_profile_n_threads"] = refdec["n_threads"]
    except Exception as e:
        extra["decode_ref_profile_error"] = str(e)[:120]
    host_extras(extra)
    if os.environ.get("COOLCHIC_BENCH_FULL", "0") == "1":
        # In a SUBPROCESS: a fresh remote compile of the batched 512x768 hop
        # window can OOM-kill the worker; the headline metric must survive.
        import subprocess
        import sys

        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--full-encode-only"],
                capture_output=True, text=True, timeout=3000,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            full = json.loads(out.stdout.strip().splitlines()[-1])
            extra.update({
                "encode_full_img_per_s_b3_n2000": round(full["img_per_s"], 5),
                "encode_full_s_per_img": round(full["s_per_img"], 1),
                "encode_full_vs_ref_cpu": round(
                    full["img_per_s"] * BASELINE_REF_CPU_FULL_ENCODE_S, 1),
                "encode_full_psnr_db": round(full["psnr_db"], 3),
                "encode_full_rate_bpp": round(full["rate_bpp"], 4),
            })
        except Exception as e:  # timeout, crash, bad output -- keep headline
            extra["encode_full_error"] = str(e)[:200]
    print(json.dumps({
        "metric": "decode_mpix_per_s_hop_512x768_x8",
        "value": round(dec["mpix_per_s"], 2),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(dec["mpix_per_s"] / BASELINE_REF_DECODE_MPIX_S, 1),
        "extra": extra,
    }))


if __name__ == "__main__":
    import sys

    if "--full-encode-only" in sys.argv:
        print(json.dumps(bench_full_encode()))
    elif "--extras-only" in sys.argv:
        print(json.dumps(host_extras({}), indent=1))
    else:
        main()
