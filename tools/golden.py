#!/usr/bin/env python3
"""Golden-fixture generator for the rows-only kernel queries.

Runs the REFERENCE pipeline implementations (/root/reference/physioview,
loaded with the pure-numpy scipy shims from tools/scipyshim.py) over the
sf0.01 events-derived signal frames and writes each query's expected output
as parquet under src/test/resources/golden/. The engine registers DuckDB
`read_parquet` oracles over these files, flipping the former `no_oracle`
queries to full row/schema/hash checks.

Where a query has no runnable reference function (q55 elliptic filtfilt,
q57 Fourier resample, q58 Lomb-Scargle band powers), the golden is computed
directly from the public algorithm in numpy — still an implementation
independent of the Scala engine.

Usage: python3 tools/golden.py [sfDir] [outDir]
"""
import importlib.util
import math
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
import scipyshim

scipyshim.install()

REF = Path("/root/reference/physioview/pipeline")
BEAT_TYPES = {"click", "purchase", "signup", "view"}


def load_ref(name):
    spec = importlib.util.spec_from_file_location(f"ref_{name}", REF / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def signal_frames(sf_dir):
    """Per-subject (values, beat sample indices), mirroring
    graft.core.SignalFrame.fromEvents: sample clock = arrival order
    (epoch-us, event_id), beats = non-error events."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("int64") // 1000
    ev = ev.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
    out = {}
    for subj, g in ev.groupby("user_id"):
        vals = g["value"].to_numpy(dtype=float)
        beats = np.flatnonzero(g["event_type"].isin(BEAT_TYPES).to_numpy())
        out[int(subj)] = (vals, beats.astype(np.int64))
    return out


def write(df, out_dir, name):
    p = Path(out_dir) / f"{name}.parquet"
    p.parent.mkdir(parents=True, exist_ok=True)
    df.to_parquet(p, index=False)
    print(f"golden {name}: {len(df)} rows -> {p}")


def frames_df(rows, cols):
    return pd.DataFrame(rows, columns=cols)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else \
        str(Path(__file__).parent.parent / "src/test/resources/golden")
    frames = signal_frames(sf_dir)
    subjects = sorted(frames)

    ECG = load_ref("ECG")
    PPG = load_ref("PPG")
    SQA = load_ref("SQA")
    EDA = load_ref("EDA")

    # ---- q35: Butterworth 0.5-15 Hz order-2 bandpass filtfilt at fs=32
    rows = []
    b, a = scipyshim.butter(2, [0.5 / 16.0, 15.0 / 16.0], "band")
    for s in subjects:
        vals, _ = frames[s]
        y = np.round(scipyshim.filtfilt(b, a, vals), 6)
        rows += [(s, i, v) for i, v in enumerate(y)]
    write(frames_df(rows, ["subject", "idx", "filtered"]).astype(
        {"subject": "int64", "idx": "int64", "filtered": "float64"}),
        out_dir, "q35_filtfilt")

    # ---- q36: Pan-Tompkins at fs=32, reference preprocessing included
    rows = []
    det32 = ECG.BeatDetectors(fs=32, preprocessed=False)
    for s in subjects:
        vals, _ = frames[s]
        for p in det32.pantompkins(vals):
            rows.append((s, int(p)))
    write(frames_df(rows, ["subject", "idx"]).astype("int64"),
          out_dir, "q36_pantompkins")

    # ---- q98: Pan-Tompkins on LONG quasi-periodic recordings, solved
    # WHOLE by the reference. The engine runs the same recordings on the
    # bucketed halo path with a split-forcing bucketLen (1024), so the
    # driver's hash compare certifies the genuinely-split multi-task path.
    # Construction mirrors graft.queries.KernelQueries.longEcgFrame
    # bit-for-bit: group g = subject % 4, series concatenated by subject
    # order, pulse train of period 30+g with a ramping amplitude, plus an
    # events-derived fractional noise floor — exact IEEE ops only.
    long_sigs = {}
    for g in range(4):
        vals_parts = []
        for s in subjects:
            if s % 4 != g:
                continue
            vals_parts.append(frames[s][0])
        long_vals = [v for part in vals_parts for v in map(float, part)]
        period = 30 + g
        sig = []
        for i, v in enumerate(long_vals):
            pulse = (8.0 + 2.0 * ((i % 977) / 977.0)) if i % period == 11 else 0.0
            noise = 0.05 * (v / 7.0 - math.floor(v / 7.0))
            sig.append(pulse + noise)
        long_sigs[g] = sig
    rows = []
    for g in range(4):
        for p in det32.pantompkins(np.asarray(long_sigs[g], dtype=float)):
            rows.append((g, int(p)))
    write(frames_df(rows, ["subject", "idx"]).astype("int64"),
          out_dir, "q98_pantompkins_split")

    # ---- q108: CHUNKED cvxEDA on the same long recordings. Mirrors
    # graft.core.KernelRunner.transformTripleBucketed exactly: chunk b's
    # input slice is idx in [b*L - halo, (b+1)*L + halo) clipped to the
    # recording, solved independently by the bitwise FISTA mirror, and only
    # chunk-core outputs (idx div L == b) are emitted. A hash match against
    # the engine's chunkLen=1024/overlap=192 run certifies the genuinely-
    # split chunk/halo/core plumbing of the K9 path.
    CHUNK, HALO = 1024, 192
    rows = []
    for g in range(4):
        sig = long_sigs[g]
        n = len(sig)
        for b in range((n + CHUNK - 1) // CHUNK):
            lo = max(0, b * CHUNK - HALO)
            hi = min(n, (b + 1) * CHUNK + HALO)
            ph, dr, tn = _cvxeda_fista_py(sig[lo:hi], fs=4)
            for i in range(b * CHUNK, min(n, (b + 1) * CHUNK)):
                rows.append((g, i, _bround6(ph[i - lo]), _bround6(dr[i - lo]),
                             _bround6(tn[i - lo])))
    write(frames_df(rows, ["subject", "idx", "phasic", "driver", "tonic"])
          .astype({"subject": "int64", "idx": "int64", "phasic": "float64",
                   "driver": "float64", "tonic": "float64"}),
          out_dir, "q108_cvxeda_split")

    # ---- q51: Engzee at fs=32 on the raw frame (preprocessed=True)
    rows = []
    det32p = ECG.BeatDetectors(fs=32, preprocessed=True)
    for s in subjects:
        vals, _ = frames[s]
        try:
            beats = det32p.engzee(vals)
        except IndexError:  # reference pops the seed detection unguarded
            beats = []
        for p in beats:
            rows.append((s, int(p)))
    write(frames_df(rows, ["subject", "idx"]).astype("int64"),
          out_dir, "q51_engzee")

    # ---- q52: Manikandan at fs=128 with cheby1 6-18 Hz preprocessing.
    # The reference raises on recordings shorter than its 2.5 s MA window
    # (np.insert length mismatch); the engine's documented extension keeps a
    # zero MA there. The golden uses an independent numpy port with the same
    # extension, SELF-CHECKED against the reference on a long signal where
    # the reference is defined.
    det128 = ECG.BeatDetectors(fs=128, preprocessed=True)
    longsig = np.tile(frames[subjects[0]][0], 10)
    ref_beats = det128.manikandan(longsig)
    own_beats = _manikandan_py(longsig, 128)
    assert np.array_equal(np.asarray(ref_beats, dtype=int), own_beats), \
        "manikandan port diverges from the reference on its defined domain"
    rows = []
    bc, ac = scipyshim.cheby1(4, 1, [6.0 / 64, 18.0 / 64], "bandpass")
    for s in subjects:
        vals, _ = frames[s]
        for p in _manikandan_py(scipyshim.filtfilt(bc, ac, vals), 128):
            rows.append((s, int(p)))
    write(frames_df(rows, ["subject", "idx"]).astype("int64"),
          out_dir, "q52_manikandan")

    # ---- q54: Elgendi ERMA at fs=32 with butter 0.5-8 Hz preprocessing
    rows = []
    ppg32 = PPG.BeatDetectors(fs=32, preprocessed=False)
    for s in subjects:
        vals, _ = frames[s]
        try:
            beats = ppg32.erma(vals)
        except IndexError:  # no wave onsets -> reference indexes beg_waves[0]
            beats = []
        for p in beats:
            rows.append((s, int(p)))
    write(frames_df(rows, ["subject", "idx"]).astype("int64"),
          out_dir, "q54_erma")

    # ---- q44: CBD artifacts over beat rows, fs=4
    rows = []
    sqa4 = SQA.Cardio(fs=4)
    for s in subjects:
        _, beats = frames[s]
        if len(beats) < 2:
            continue
        art = sqa4.identify_artifacts(beats, method="cbd")
        for p in np.unique(np.asarray(art, dtype=np.int64)):
            rows.append((s, int(p)))
    write(frames_df(rows, ["subject", "idx"]).astype("int64"),
          out_dir, "q44_cbd")

    # ---- q49/q50: Hegarty-Craver correction FSM, fs=4 (+ summary, seg 10 s)
    rows = []
    for s in subjects:
        _, beats = frames[s]
        if len(beats) < 2:
            for bpos in beats:
                rows.append((s, 0, 0, np.nan, np.nan, float(bpos), 0.0, None))
                rows.append((s, 1, 0, np.nan, np.nan, float(bpos), np.nan, None))
            continue
        _, _, orig, corr = sqa4.correct_interval(
            beats_ix=beats, print_estimated_hr=False)
        for pos, r in enumerate(orig.itertuples(index=False)):
            rows.append((s, 0, pos, r[0], _f(r[1]), float(r[2]), float(r[3]), None))
        for pos, r in enumerate(corr.itertuples(index=False)):
            flag = r[3] if isinstance(r[3], str) else None
            rows.append((s, 1, pos, r[0], _f(r[1]), float(r[2]), np.nan, flag))
    q49 = frames_df(rows, ["subject", "side", "pos", "ibi_ms", "ibi",
                           "beat", "correction", "flag"])
    q49 = q49.astype({"subject": "int64", "side": "int32", "pos": "int32",
                      "ibi_ms": "float64", "ibi": "float64",
                      "beat": "float64", "correction": "float64"})
    write(q49, out_dir, "q49_correct_interval")

    seg_rows = 10 * 4  # segSize * fs
    g = q49.copy()
    g["segment"] = np.ceil(g["beat"] / seg_rows).astype("int64")
    o = g[g["side"] == 0].groupby(["subject", "segment"]).agg(
        n_corrected=("correction", "sum"), n=("correction", "size"))
    o["pct_corrected"] = np.round(o["n_corrected"] / o["n"] * 100, 2)
    o["n_corrected"] = o["n_corrected"].astype("int64")
    # Spark's pivot keeps every (subject, segment) group even when all its
    # flags are null (counts 0) — count with predicates, not pivot_table.
    c = g[g["side"] == 1].groupby(["subject", "segment"]).agg(
        n_correct=("flag", lambda x: (x == "Correct").sum()),
        n_short=("flag", lambda x: (x == "Short").sum()),
        n_long=("flag", lambda x: (x == "Long").sum()),
        n_extra_long=("flag", lambda x: (x == "Extra Long").sum()))
    q50 = c.join(o, how="inner").reset_index()[[
        "subject", "segment", "n_correct", "n_short", "n_long",
        "n_extra_long", "n_corrected", "pct_corrected"]]
    for col in ["n_correct", "n_short", "n_long", "n_extra_long"]:
        q50[col] = q50[col].astype("int64")
    write(q50, out_dir, "q50_correct_summary")

    # ---- q55: elliptic 1-15 Hz order-2 rp 0.15 rs 80 filtfilt at fs=64
    rows = []
    b, a = scipyshim.ellip(2, 0.15, 80.0, [1.0 / 32, 15.0 / 32], "band")
    for s in subjects:
        vals, _ = frames[s]
        y = np.round(scipyshim.filtfilt(b, a, vals), 6)
        rows += [(s, i, v) for i, v in enumerate(y)]
    write(frames_df(rows, ["subject", "idx", "filtered"]).astype(
        {"subject": "int64", "idx": "int64", "filtered": "float64"}),
        out_dir, "q55_ellip_filtfilt")

    # ---- q57: Fourier-domain resample 4 Hz -> 8 Hz
    rows = []
    for s in subjects:
        vals, _ = frames[s]
        num = int(round(len(vals) * 8 / 4))
        y = np.round(scipyshim.resample(vals, num), 6)
        rows += [(s, i, v) for i, v in enumerate(y)]
    write(frames_df(rows, ["subject", "ridx", "value_rs"]).astype(
        {"subject": "int64", "ridx": "int64", "value_rs": "float64"}),
        out_dir, "q57_fourier_resample")

    # ---- q67: frequency-domain Gaussian low-pass, cutoff 0.5 Hz at fs=4
    rows = []
    for s in subjects:
        vals, _ = frames[s]
        freqs = np.fft.fftfreq(len(vals), d=1 / 4.0)
        resp = np.exp(-0.5 * (freqs / 0.5) ** 2)
        y = np.round(np.real(np.fft.ifft(np.fft.fft(vals) * resp)), 6)
        rows += [(s, i, v) for i, v in enumerate(y)]
    write(frames_df(rows, ["subject", "idx", "filtered"]).astype(
        {"subject": "int64", "idx": "int64", "filtered": "float64"}),
        out_dir, "q67_gaussian_lowpass")

    # ---- q58: Lomb-Scargle LF/HF band powers over the IBI series, fs=4
    rows = []
    freqs = np.array([i * 0.004 for i in range(1, 101)])
    for s in subjects:
        _, beats = frames[s]
        if len(beats) < 2:
            continue
        t = beats[1:] / 4.0
        y = np.diff(beats) / 4.0 * 1000.0
        lf = hf = 0.0
        n = len(y)
        ybar = y.sum() / n
        var = ((y - ybar) ** 2).sum() / (n - 1)
        for f in freqs:
            w = 2.0 * math.pi * f
            tau = math.atan2(np.sin(2 * w * t).sum(), np.cos(2 * w * t).sum()) \
                / (2.0 * 2.0 * math.pi * f)
            ph = w * (t - tau)
            yc = y - ybar
            sc = (yc * np.cos(ph)).sum()
            ss = (yc * np.sin(ph)).sum()
            cc = (np.cos(ph) ** 2).sum()
            ssq = (np.sin(ph) ** 2).sum()
            power = (sc * sc / cc + ss * ss / ssq) / (2.0 * var)
            if 0.04 <= f < 0.15:
                lf += power * 0.004
            elif 0.15 <= f < 0.4:
                hf += power * 0.004
        rows.append((s, np.round(lf, 6), np.round(hf, 6),
                     np.round(lf / hf, 6)))
    write(frames_df(rows, ["subject", "lf_power", "hf_power", "lf_hf_ratio"])
          .astype({"subject": "int64"}), out_dir, "q58_lomb")

    # ---- q60: per-segment tonic SCL excluding SCR intervals, fs=4, seg 10 s
    # np.mean sums pairwise while the engine kernel sums sequentially —
    # a sub-1e-12 difference that can straddle a 6-digit rounding boundary.
    # The semantics under test are the SCR peak/interval masking; pin the
    # final mean to sequential left-to-right summation for the comparison.
    rows = []
    orig_mean = np.mean

    def _seq_mean(a, *args, **kw):
        lst = np.asarray(a, dtype=float).ravel().tolist()
        return sum(lst) / len(lst) if lst else float("nan")

    np.mean = _seq_mean
    try:
        for s in subjects:
            vals, _ = frames[s]
            scl = EDA.compute_tonic_scl(vals, fs=4, seg_size=10)
            for k, v in enumerate(np.asarray(scl, dtype=float)):
                rows.append((s, k + 1, np.round(v, 6)))
    finally:
        np.mean = orig_mean
    write(frames_df(rows, ["subject", "segment", "tonic_scl"]).astype(
        {"subject": "int64", "segment": "int64", "tonic_scl": "float64"}),
        out_dir, "q60_tonic_scl")

    # ---- q59: cvxEDA-class decomposition, deterministic FISTA solver.
    # Pure-Python mirror of graft.kernels.EdaDecompose.cvxEdaKernel with
    # the SAME operation order (sequential reductions, same expression
    # associativity), so the fixed-iteration trajectory — and therefore the
    # output — is bitwise identical to the engine's. Rounding mirrors Spark
    # bround (BigDecimal.valueOf shortest-repr, HALF_EVEN) via Decimal.
    rows = []
    for s in subjects:
        vals, _ = frames[s]
        ph, dr, tn = _cvxeda_fista_py(list(map(float, vals)), fs=4)
        rows += [(s, i, _bround6(ph[i]), _bround6(dr[i]), _bround6(tn[i]))
                 for i in range(len(ph))]
    write(frames_df(rows, ["subject", "idx", "phasic", "driver", "tonic"])
          .astype({"subject": "int64", "idx": "int64", "phasic": "float64",
                   "driver": "float64", "tonic": "float64"}),
          out_dir, "q59_cvxeda")


def _bround6(x):
    """Spark bround(col, 6) for doubles: scala BigDecimal(double) uses
    java BigDecimal.valueOf = shortest decimal repr (same as Python repr),
    then setScale(6, HALF_EVEN)."""
    import decimal
    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_EVEN))


def _cvxeda_fista_py(y, fs, tau0=2.0, tau1=0.7, delta_knot=10.0,
                     alpha=8e-4, gamma=1e-2, iters=1200):
    """Bitwise mirror of EdaDecompose.cvxEdaKernel (pure Python floats =
    IEEE doubles; all loops and reductions in the Scala kernel's order)."""
    import math
    n = len(y)
    if n < 8:
        return [0.0] * n, [0.0] * n, list(y)
    delta = 1.0 / fs
    a1 = 1.0 / min(tau1, tau0)
    a0 = 1.0 / max(tau1, tau0)
    den = (a1 - a0) * delta * delta
    ar = [(a1 * delta + 2.0) * (a0 * delta + 2.0) / den,
          (2.0 * a1 * a0 * delta * delta - 8.0) / den,
          (a1 * delta - 2.0) * (a0 * delta - 2.0) / den]
    ma = [1.0, 2.0, 1.0]

    def solve_a(p):
        q = [0.0] * n
        q[0] = p[0]
        if n > 1:
            q[1] = p[1]
        for i in range(2, n):
            q[i] = (p[i] - ar[1] * q[i - 1] - ar[2] * q[i - 2]) / ar[0]
        return q

    def solve_at(v):
        x = [0.0] * n
        for i in range(n - 1, -1, -1):
            s = v[i]
            if i + 1 < n and i + 1 >= 2:
                s -= ar[1] * x[i + 1]
            if i + 2 < n and i + 2 >= 2:
                s -= ar[2] * x[i + 2]
            x[i] = s / ar[0] if i >= 2 else s
        return x

    def apply_m(q):
        out = [0.0] * n
        out[0] = q[0]
        if n > 1:
            out[1] = q[1]
        for i in range(2, n):
            out[i] = ma[0] * q[i] + ma[1] * q[i - 1] + ma[2] * q[i - 2]
        return out

    def apply_mt(v):
        out = [0.0] * n
        for i in range(n):
            s = v[i] if i < 2 else ma[0] * v[i]
            if i + 1 < n and i + 1 >= 2:
                s += ma[1] * v[i + 1]
            if i + 2 < n and i + 2 >= 2:
                s += ma[2] * v[i + 2]
            out[i] = s
        return out

    def apply_h(p):
        return apply_m(solve_a(p))

    def apply_ht(v):
        return solve_at(apply_mt(v))

    dks = max(1, int(math.floor(delta_knot / delta + 0.5)))  # scala math.round
    spl0 = [float(i) for i in range(1, dks)] + \
           [float(i) for i in range(dks, 0, -1)]
    m = len(spl0)
    spl = [0.0] * (2 * m - 1)
    for i in range(m):
        for j in range(m):
            spl[i + j] += spl0[i] * spl0[j]
    mx = max(spl)
    spl = [v / mx for v in spl]
    knots = list(range(0, n, dks))
    n_b = len(knots)
    off = len(spl) // 2

    def apply_b(l):
        out = [0.0] * n
        for b in range(n_b):
            base = knots[b]
            for s_ in range(len(spl)):
                i = base + s_ - off
                if 0 <= i < n:
                    out[i] += spl[s_] * l[b]
        return out

    def apply_bt(v):
        out = [0.0] * n_b
        for b in range(n_b):
            base = knots[b]
            acc = 0.0
            for s_ in range(len(spl)):
                i = base + s_ - off
                if 0 <= i < n:
                    acc += spl[s_] * v[i]
            out[b] = acc
        return out

    def apply_c(d):
        return [d[0] + d[1] * (i + 1.0) / n for i in range(n)]

    def apply_ct(v):
        s0 = 0.0
        s1 = 0.0
        for i in range(n):
            s0 += v[i]
            s1 += v[i] * (i + 1.0) / n
        return [s0, s1]

    pw = [1.0] * n
    l_est = 1.0
    for _ in range(12):
        w = apply_ht(apply_h(pw))
        acc = 0.0
        for x in w:
            acc += x * x
        l_est = math.sqrt(acc)
        if l_est > 0:
            pw = [x / max(l_est, 1e-12) for x in w]
        else:
            pw = [1.0] * n
    b_norm_sq = 0.0
    for x in spl:
        b_norm_sq += x * x
    step = 1.0 / (l_est + b_norm_sq + n + 1.0)

    p = [0.0] * n
    l = [0.0] * n_b
    d = [0.0, 0.0]
    pv = list(p)
    lv = list(l)
    dv = list(d)
    p_new = [0.0] * n
    l_new = [0.0] * n_b
    d_new = [0.0, 0.0]
    resid = [0.0] * n
    tk = 1.0
    it = 0
    last_obj = 1.7976931348623157e308  # Double.MaxValue
    done = False
    while it < iters and not done:
        hp = apply_h(pv)
        bl = apply_b(lv)
        c0 = dv[0]
        c1 = dv[1]
        for i in range(n):
            resid[i] = hp[i] + bl[i] + c0 + c1 * (i + 1.0) / n - y[i]
        if it % 25 == 24:
            obj = 0.0
            for i in range(n):
                obj += resid[i] * resid[i]
            if last_obj - obj < 1e-10 * max(obj, 1e-12):
                done = True
            last_obj = obj
        gp = apply_ht(resid)
        gl = apply_bt(resid)
        gd = apply_ct(resid)
        t_new = (1 + math.sqrt(1 + 4 * tk * tk)) / 2
        mom = (tk - 1) / t_new
        for i in range(n):
            pn = max(0.0, pv[i] - step * (gp[i] + alpha))
            p_new[i] = pn
            pv[i] = pn + mom * (pn - p[i])
        for i in range(n_b):
            ln = lv[i] - step * (gl[i] + gamma * lv[i])
            l_new[i] = ln
            lv[i] = ln + mom * (ln - l[i])
        d_new[0] = dv[0] - step * gd[0]
        d_new[1] = dv[1] - step * gd[1]
        dv[0] = d_new[0] + mom * (d_new[0] - d[0])
        dv[1] = d_new[1] + mom * (d_new[1] - d[1])
        p, p_new = p_new, p
        l, l_new = l_new, l
        d[0] = d_new[0]
        d[1] = d_new[1]
        tk = t_new
        it += 1
    phasic = apply_h(p)
    bl = apply_b(l)
    cd = apply_c(d)
    tonic = [bl[i] + cd[i] for i in range(n)]
    return phasic, p, tonic


def _f(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return np.nan


def _ma_cum(x, w):
    """Reference _ma_cumulative_sum: trailing mean, length len(x)-w+1."""
    if len(x) < w:
        return np.empty(0)
    cs = np.cumsum(np.insert(x, 0, 0))
    return (cs[w:] - cs[:-w]) / float(w)


def _manikandan_py(signal, fs, window=0.44):
    """Manikandan-Soman R-peak detection (reference ECG.py:385-513) on an
    already-filtered signal, with zero-MA handling for recordings shorter
    than an MA window (the engine's documented extension of the reference's
    undefined/raising behavior) and first-argmax tie-breaks (the reference's
    `.item()` raises on ties)."""
    n = len(signal)
    if n < 2:
        return np.empty(0, dtype=int)
    dn = np.append(signal[1:], 0) - signal
    mx = np.max(np.abs(dn))
    if mx == 0:
        return np.empty(0, dtype=int)
    dtn = dn / mx
    with np.errstate(divide="ignore", invalid="ignore"):
        sn = -(dtn ** 2) * np.log10(dtn ** 2)
    wl = int(0.15 * fs)
    snf = np.zeros(n)
    ma1 = _ma_cum(sn, wl)
    if len(ma1):
        snf[wl - 1:wl - 1 + len(ma1)] = ma1
    zn = np.imag(scipyshim.hilbert(snf))
    ma_len = int(fs * 2.5)
    znma = np.zeros(n)
    ma2 = _ma_cum(zn, ma_len)
    if len(ma2):
        znma[ma_len - 1:ma_len - 1 + len(ma2)] = ma2
    s = zn - znma
    crossings = np.flatnonzero(np.diff(np.sign(s)) > 0)
    half = round(fs * 0.12)
    beats = []
    for c in crossings:
        best, bv = -1, -np.inf
        for k in list(range(c - half, c + 1)) + \
                [j for j in range(c + 1, c + half + 1) if j < n]:
            kk = n + k if k < 0 else k  # numpy negative-index wrap
            if 0 <= kk < n and signal[kk] > bv:
                bv, best = signal[kk], kk
        if best > 0:
            beats.append(best)
    unique = list(dict.fromkeys(beats))
    is_beat = np.zeros(n, dtype=bool)
    is_beat[unique] = True
    wlen, step = int(fs * window), int(fs * 0.1)
    for start in range(0, n, max(step, 1)):
        inw = np.flatnonzero(is_beat[start:min(start + wlen, n)]) + start
        if len(inw) >= 2:
            v = signal[inw]
            thr = (v.min() + v.max()) * 0.5 if len(inw) == 2 \
                else (np.median(v) + v.max()) * 0.5
            is_beat[inw[v < thr]] = False
    return np.flatnonzero(is_beat)


if __name__ == "__main__":
    main()
