"""The full probe battery: every readout × split the RESULTS.md studies
report, in one call over ONE feature sweep.

Promoted from benchmarks/probe_study.py (r3) so the honest evaluation
protocol is a first-class API, not a benchmark-script internal: the
snippet-level split leaks per-recording signatures (RESULTS.md "protocol
finding"), so any serious claim needs the file-disjoint columns this
battery produces — speaker under mean/last/max time pooling with
multi-seed error bars, utterance pooling, the snippet split for leak-size
comparison, and the phone probe under both splits.

Determinism contract: probes are seeded and run over cached features, so
rows are bit-comparable across invocations and across processes — the
study drivers (benchmarks/probe_study.py, probe_ckpt.py) and the eval CLI
(`--battery`) all share this function for exactly that reason. Changes
here invalidate cross-run comparability; add columns, don't perturb
existing ones.
"""

from __future__ import annotations

import numpy as np

from cpc_tpu.eval.probes import (extract_phone_frame_features,
                                 extract_speaker_frame_features, pool_time,
                                 probe_phone_features,
                                 probe_speaker_features)


def probe_milestone(model, params, probe_ds, *, normalize: bool,
                    probe_seeds: int = 3) -> dict:
    """One milestone's full probe battery.

    ONE feature sweep (extraction dominates probe cost), then every
    split/seed probes the cached features. Returns the row dict WITHOUT
    the "step" key (the caller knows the step).
    """
    if probe_seeds < 1:
        raise ValueError(f"probe_seeds must be >= 1, got {probe_seeds} "
                         "(0 would silently compute a battery of NaNs "
                         "and then crash after the expensive sweep)")
    frames, ylab, files = extract_speaker_frame_features(
        model, params, probe_ds, max_snippets=len(probe_ds),
        normalize=normalize)
    pooled = pool_time(frames, "mean")
    # c[:, -1] holds evidence integrated over the whole snippet (the
    # speaker posterior a recurrent gar accumulates); mean pooling
    # dilutes it with uninformed early frames
    last = pool_time(frames, "last")
    # max pooling keys on the strongest local evidence anywhere in the
    # trajectory — separates "distributed but peaky" from "weak everywhere"
    mx = pool_time(frames, "max")
    del frames
    n_spk = probe_ds.num_speakers
    # HEADLINE: file-disjoint split — eval snippets come from utterances
    # the probe never saw. The snippet-level split leaks per-utterance
    # signatures (each file draws its own f0), so it overstates
    # speaker-ID; reported alongside for comparison.
    file_accs, last_accs, max_accs, snip_accs = [], [], [], []
    file_eval_ns, snip_eval_ns = [], []
    for ps in range(probe_seeds):
        spk_f = probe_speaker_features(pooled, ylab, files, n_spk,
                                       steps=400, seed=ps, split="file")
        file_accs.append(spk_f.accuracy)
        file_eval_ns.append(spk_f.num_eval)
        last_accs.append(probe_speaker_features(
            last, ylab, files, n_spk, steps=400, seed=ps,
            split="file").accuracy)
        max_accs.append(probe_speaker_features(
            mx, ylab, files, n_spk, steps=400, seed=ps,
            split="file").accuracy)
        spk_s = probe_speaker_features(pooled[:800], ylab[:800],
                                       files[:800], n_spk,
                                       steps=400, seed=ps)
        snip_accs.append(spk_s.accuracy)
        snip_eval_ns.append(spk_s.num_eval)
    # utterance pooling collapses ~9 snippets into one item, so it uses
    # the WHOLE corpus to keep enough items per class
    utt = probe_speaker_features(pooled, ylab, files, n_spk, steps=400,
                                 pool="utterance")
    # Phone probe under BOTH splits (extraction cached across seeds).
    # file split = honest protocol (eval frames from held-out
    # utterances); snippet split kept for the leak-size comparison.
    ph_feats, ph_lab, ph_files = extract_phone_frame_features(
        model, params, probe_ds, feature="z", max_snippets=200,
        normalize=normalize)
    ph_file_accs = [probe_phone_features(
        ph_feats, ph_lab, ph_files, steps=400, seed=ps,
        split="file").accuracy for ps in range(probe_seeds)]
    ph = probe_phone_features(ph_feats, ph_lab, ph_files, steps=400,
                              split="snippet")
    return {"speaker_file_acc": round(float(np.mean(file_accs)), 4),
            "speaker_file_acc_std": round(float(np.std(file_accs)), 4),
            "speaker_file_last_acc": round(float(np.mean(last_accs)), 4),
            "speaker_file_last_acc_std": round(float(np.std(last_accs)), 4),
            "speaker_file_max_acc": round(float(np.mean(max_accs)), 4),
            "speaker_file_max_acc_std": round(float(np.std(max_accs)), 4),
            "speaker_file_eval_n": int(np.mean(file_eval_ns)),
            "speaker_acc": round(float(np.mean(snip_accs)), 4),
            "speaker_acc_std": round(float(np.std(snip_accs)), 4),
            "speaker_eval_n": int(np.mean(snip_eval_ns)),
            "speaker_classes": spk_s.num_classes,
            "speaker_utt_acc": round(utt.accuracy, 4),
            "speaker_utt_eval_n": utt.num_eval,
            "phone_file_acc": round(float(np.mean(ph_file_accs)), 4),
            "phone_file_acc_std": round(float(np.std(ph_file_accs)), 4),
            "phone_snip_acc": round(ph.accuracy, 4),
            "phone_eval_n": ph.num_eval,
            "phone_classes": ph.num_classes}
