"""Host data-plane throughput, MEASURED (VERDICT r2 weak #5 / next #5).

SURVEY.md §8.4 sets the production requirement: 10k audio-sec/sec/chip on a
v5e-8 pod is ~80k audio-sec/s of feed = 2.56 GB/s of int16 samples. This
benchmark measures what THIS host's data plane actually delivers per core,
so RESULTS.md can state feed capacity as a number instead of an argument:

  * packed-memmap batch assembly (the production path: pure int16 gather)
    in audio-sec/s and GB/s;
  * native FLAC decode in MB/s of decoded PCM per core, plus a direct
    GIL-release check (decode in a worker thread must not stall a
    counting main thread — the basis for claiming thread scaling on
    multi-core production hosts; this bench host has ONE core, so scaling
    itself cannot be demonstrated here);
  * the numpy WAV decode path in MB/s (GIL-bound: no release claim).

Run: python benchmarks/exp_host.py   (CPU only; safe while the TPU is busy)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16_000


def bench_packed_assembly(root: str, batch: int = 64,
                          snippet: int = 20_480) -> dict:
    """Batcher over PackedSnippetDataset: int16 memmap gather throughput."""
    from cpc_tpu.data.loader import Batcher
    from cpc_tpu.data.packed import PackedSnippetDataset

    ds = PackedSnippetDataset(root, snippet)
    b = Batcher(ds, batch, shuffle=True, seed=0, prefetch=0)
    for _ in b.one_epoch(0):  # warm the page cache / allocator
        pass
    n, t0 = 0, time.perf_counter()
    for epoch in range(1, 5):  # distinct shuffles = realistic random gather
        for _, _, hb in b.one_epoch(epoch):
            n += 1
    dt = time.perf_counter() - t0
    bytes_per_batch = batch * snippet * 2
    audio_per_batch = batch * snippet / SR
    return {
        "what": "packed_memmap_batch_assembly",
        "batches": n,
        "ms_per_batch": round(1000 * dt / n, 3),
        "audio_sec_per_sec": round(n * audio_per_batch / dt, 1),
        "gb_per_sec": round(n * bytes_per_batch / dt / 1e9, 3),
    }


def bench_flac_decode(corpus: str) -> dict:
    """Native decoder MB/s of decoded PCM (per core — one decode thread)."""
    from cpc_tpu.data.flac import read_flac

    files = sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(corpus)
        for f in fs if f.endswith(".flac"))
    # warm (builds the .so, faults in the files)
    total = sum(read_flac(p)[0].nbytes // 2 for p in files)  # int16-equiv
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        for p in files:
            read_flac(p)
    dt = time.perf_counter() - t0
    pcm_mb = reps * total / 1e6
    return {
        "what": "native_flac_decode",
        "files": len(files),
        "pcm_mb_per_sec_per_core": round(pcm_mb / dt, 1),
        "audio_sec_per_sec_per_core": round(
            reps * total / 2 / SR / dt, 1),
    }


def bench_flac_gil_release(corpus: str) -> dict:
    """Counts main-thread progress while a worker decodes: if the ctypes
    call held the GIL, the counter would stall to ~0 for the decode's
    duration. released=True is the basis for multi-core thread scaling."""
    from cpc_tpu.data.flac import read_flac

    files = sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(corpus)
        for f in fs if f.endswith(".flac"))

    def count_for(secs: float) -> float:
        n, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < secs:
            n += 1
        return n / secs

    read_flac(files[0])  # warm
    baseline = count_for(0.5)

    stop = threading.Event()

    def worker():
        while not stop.is_set():
            for p in files:
                read_flac(p)
                if stop.is_set():
                    break

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    time.sleep(0.05)
    contended = count_for(1.0)
    stop.set()
    t.join(timeout=10)
    ratio = contended / baseline
    return {
        "what": "flac_ctypes_gil",
        "counter_rate_ratio_under_decode": round(ratio, 3),
        # on ONE core a perfectly GIL-releasing worker still steals ~half
        # the CPU; holding the GIL for whole decodes would push this toward
        # the sys.setswitchinterval duty cycle (near 0 for ~ms decodes)
        "released": bool(ratio > 0.15),
    }


def bench_wav_decode(corpus: str) -> dict:
    from cpc_tpu.data.wavio import read_wav

    files = sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(corpus)
        for f in fs if f.endswith(".wav"))
    total = sum(read_wav(p)[0].nbytes // 2 for p in files)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        for p in files:
            read_wav(p)
    dt = time.perf_counter() - t0
    return {
        "what": "numpy_wav_decode",
        "files": len(files),
        "pcm_mb_per_sec_per_core": round(reps * total / 1e6 / dt, 1),
        "audio_sec_per_sec_per_core": round(reps * total / 2 / SR / dt, 1),
    }


def main() -> None:
    from cpc_tpu.data.packed import pack_corpus
    from cpc_tpu.data.synthetic import generate_synthetic_corpus
    from cpc_tpu.data.flac_encoder import write_flac
    from cpc_tpu.data.wavio import read_wav

    ncores = os.cpu_count() or 1
    results = []
    with tempfile.TemporaryDirectory() as root:
        wav_dir = os.path.join(root, "wav")
        generate_synthetic_corpus(wav_dir, num_speakers=8,
                                  files_per_speaker=3,
                                  seconds_per_file=45.0, seed=3)
        # FLAC twin of the corpus via the hermetic encoder
        flac_dir = os.path.join(root, "flac")
        for dp, _, fs in os.walk(wav_dir):
            for f in fs:
                if not f.endswith(".wav"):
                    continue
                x, sr = read_wav(os.path.join(dp, f))
                pcm = np.clip(np.round(x * 32768.0), -32768,
                              32767).astype(np.int16)
                rel = os.path.relpath(dp, wav_dir)
                os.makedirs(os.path.join(flac_dir, rel), exist_ok=True)
                write_flac(os.path.join(flac_dir, rel, f[:-4] + ".flac"),
                           pcm, sr, subframe="lpc8", partition_order=2)
        packed_dir = os.path.join(root, "packed")
        pack_corpus(wav_dir, packed_dir)

        results.append(bench_packed_assembly(packed_dir))
        results.append(bench_flac_decode(flac_dir))
        results.append(bench_flac_gil_release(flac_dir))
        results.append(bench_wav_decode(wav_dir))

    need = 80_000  # audio-sec/s for v5e-8 at the 10k/chip target (§8.4)
    packed = results[0]["audio_sec_per_sec"]
    flac = results[1]["audio_sec_per_sec_per_core"]
    summary = {
        "what": "summary",
        "host_cores": ncores,
        "v5e8_feed_requirement_audio_sec_per_sec": need,
        "packed_feed_margin_this_host": round(packed / need, 2),
        "flac_cores_needed_no_pack": round(need / flac, 1),
        "verdict": ("packed memmap path meets the v5e-8 requirement on this "
                    "host" if packed >= need else
                    "packed path below requirement on this host"),
    }
    for r in results + [summary]:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
