#!/usr/bin/env python3
"""Deterministic IO-layer fixtures for the driver-oracle IO queries
(q92-q97): an Empatica E4 ZIP archive, an Actiwave-style EDF file, a
batch-of-CSVs directory, a column-mapped CSV, and a beat-editor edit file,
written under src/test/resources/io/.

Every value is chosen to be exactly representable in binary (k/64, k/32,
integer timestamps) so the Spark reader and the DuckDB oracle recompute
bit-identical doubles from the same text, and the synthesized-timestamp
arithmetic ((start + i/fs) * 1e6) stays exact integer math in doubles.

The EDF golden frame is computed here, independently of the Scala parser,
from the same arrays the EDF bytes are built from (format per the public
spec, edfplus.info: 256-byte ASCII header + 256 bytes/signal of field
blocks + 2-byte little-endian data records).

Usage: python3 tools/iofixtures.py [outDir]
"""
import io
import math
import struct
import sys
import zipfile
from pathlib import Path

import pandas as pd

START = 1600000000  # Unix s, integer


def det(i, k, mod, div):
    """Deterministic exact-binary sample value: ((i*k) % mod) / div."""
    return ((i * k) % mod) / div


def e4_csv(cols, fs, n, gen):
    lines = [",".join(f"{START:.2f}" for _ in cols),
             ",".join(f"{float(fs):.6f}" for _ in cols)]
    for i in range(n):
        lines.append(",".join(repr(gen(i, c)) for c in range(len(cols))))
    return "\n".join(lines) + "\n"


def main():
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else \
        Path(__file__).parent.parent / "src/test/resources/io"
    out.mkdir(parents=True, exist_ok=True)
    e4dir = out / "e4"
    e4dir.mkdir(exist_ok=True)

    # ---- E4 archive members (layout per reference physioview.py:860-907)
    members = {
        "ACC.csv": e4_csv(["X", "Y", "Z"], 32, 96,
                          lambda i, c: float((i * (7 + c) + 11 * c) % 129 - 64)),
        "BVP.csv": e4_csv(["BVP"], 64, 192, lambda i, c: det(i, 13, 200, 32)),
        "EDA.csv": e4_csv(["EDA"], 4, 24, lambda i, c: det(i, 5, 640, 64)),
        "TEMP.csv": e4_csv(["TEMP"], 4, 24, lambda i, c: 30.0 + det(i, 3, 160, 32)),
        "HR.csv": e4_csv(["HR"], 1, 6, lambda i, c: 60.0 + float((i * 9) % 40)),
    }
    # IBI.csv: header row = start,'IBI'; rows = offset-seconds, ibi-seconds
    ibi_lines = [f"{START:.2f}, IBI"]
    t = 0.0
    for i in range(24):
        ibi = (48 + (i * 5) % 24) / 64.0  # 0.75..1.11 s, exact binary
        t += ibi
        ibi_lines.append(f"{repr(t)},{repr(ibi)}")
    members["IBI.csv"] = "\n".join(ibi_lines) + "\n"
    members["info.txt"] = "Device: E4 2.1\n"
    members["tags.csv"] = f"{START + 10:.2f}\n"

    with zipfile.ZipFile(out / "e4.zip", "w", zipfile.ZIP_DEFLATED) as zf:
        for name, text in members.items():
            zf.writestr(name, text)
            (e4dir / name).write_text(text)  # extracted copies for DuckDB

    # ---- Actiwave-style EDF: ECG0 @ 8 sps/record + X @ 2 sps/record,
    # 1 s records, 12 records
    n_rec, rec_dur = 12, 1
    chans = [
        {"label": "ECG0", "sps": 8, "pmin": -4.0, "pmax": 4.0,
         "dmin": -32768, "dmax": 32767,
         "dig": lambda r, s: ((r * 8 + s) * 517) % 4001 - 2000},
        {"label": "X", "sps": 2, "pmin": -8.0, "pmax": 8.0,
         "dmin": -2048, "dmax": 2047,
         "dig": lambda r, s: ((r * 2 + s) * 97) % 1500 - 750},
    ]
    ns = len(chans)

    def pad(v, w):
        s = str(v)
        assert len(s) <= w, (v, w)
        return s.ljust(w)

    hdr = io.BytesIO()
    hdr.write(pad("0", 8).encode())            # version
    hdr.write(pad("graft fixture", 80).encode())   # patient
    hdr.write(pad("synthetic", 80).encode())   # recording
    hdr.write(b"14.09.20")                      # dd.mm.yy for 2020-09-14
    hdr.write(b"12.26.40")                      # hh.mm.ss
    header_len = 256 + 256 * ns
    hdr.write(pad(str(header_len), 8).encode())
    hdr.write(pad("", 44).encode())            # reserved
    hdr.write(pad(str(n_rec), 8).encode())
    hdr.write(pad(str(rec_dur), 8).encode())
    hdr.write(pad(str(ns), 4).encode())
    for field, width in [("label", 16), ("transducer", 80), ("dim", 8),
                         ("pmin", 8), ("pmax", 8), ("dmin", 8), ("dmax", 8),
                         ("prefilter", 80), ("sps", 8), ("reserved", 32)]:
        for c in chans:
            v = {"label": lambda: c["label"], "transducer": lambda: "",
                 "dim": lambda: "mV", "pmin": lambda: c["pmin"],
                 "pmax": lambda: c["pmax"], "dmin": lambda: c["dmin"],
                 "dmax": lambda: c["dmax"], "prefilter": lambda: "",
                 "sps": lambda: c["sps"], "reserved": lambda: ""}[field]()
            hdr.write(pad(v, width).encode())
    body = hdr.getvalue()
    assert len(body) == header_len, len(body)
    data = io.BytesIO()
    for r in range(n_rec):
        for c in chans:
            for s in range(c["sps"]):
                data.write(struct.pack("<h", c["dig"](r, s)))
    (out / "actiwave.edf").write_bytes(body + data.getvalue())

    # Expected frame, computed from the same arrays (NOT via the Scala
    # parser): value = (dig - dmin) * (pmax-pmin)/(dmax-dmin) + pmin;
    # ts_us = epoch(2020-09-14T12:26:40Z)*1e6 + round(i/fs*1e6).
    epoch_us = 1600086400 * 1000000
    rows = []
    for c in chans:
        fs = c["sps"] / float(rec_dur)
        scale = (c["pmax"] - c["pmin"]) / float(c["dmax"] - c["dmin"])
        for i in range(n_rec * c["sps"]):
            dig = c["dig"](i // c["sps"], i % c["sps"])
            rows.append((c["label"], i,
                         epoch_us + int(math.floor(i / fs * 1e6 + 0.5)),
                         (dig - c["dmin"]) * scale + c["pmin"]))
    pd.DataFrame(rows, columns=["channel", "idx", "ts_us", "value"]).astype(
        {"channel": "string", "idx": "int64", "ts_us": "int64",
         "value": "float64"}).to_parquet(out / "edf_frame.parquet", index=False)

    # ---- batch-of-CSVs dir: 3 subjects, Timestamp (unique, int seconds
    # interleaved offsets) + eda value
    bdir = out / "batch"
    bdir.mkdir(exist_ok=True)
    for k, subj in enumerate(["alpha", "beta", "gamma"]):
        lines = ["time_s,eda_uS"]
        for i in range(40 + 5 * k):
            lines.append(f"{START + i * 2 + k},{repr(det(i + k, 11, 512, 64))}")
        (bdir / f"{subj}.csv").write_text("\n".join(lines) + "\n")

    # ---- column-mapped single CSV (S4): arbitrary headers
    lines = ["when,microsiemens,temp_c"]
    for i in range(50):
        lines.append(f"{START + i},{repr(det(i, 9, 448, 64))},{repr(30.0 + det(i, 3, 96, 32))}")
    (out / "mapped.csv").write_text("\n".join(lines) + "\n")

    # ---- beat-editor edit instructions (S10; reference
    # physioview.py:1690-1737): records with epoch-ms x/y/from/to
    edits = []
    for i in range(12):
        kind = ["ADD", "DELETE", "MOVE"][i % 3]
        base = (START + 100 + i) * 1000
        if kind == "MOVE":
            edits.append(f'{{"x":{base},"y":{repr(det(i, 7, 320, 64))},'
                         f'"from":{base - 250},"to":{base + 250},"editType":"{kind}"}}')
        else:
            edits.append(f'{{"x":{base},"y":{repr(det(i, 7, 320, 64))},'
                         f'"editType":"{kind}"}}')
    (out / "edited.json").write_text("\n".join(edits) + "\n")

    # ---- tone.wav (q111): canonical 44-byte RIFF/WAVE PCM, mono 16-bit
    # 8 kHz, 400 deterministic int16 samples. wav_frame.parquet is the
    # GENERATOR's decode (sample/32768, exact binary) — the oracle frame,
    # independent of the Scala decoder.
    n_wav = 400
    samples = [((i * 37 + 11) % 2048 - 1024) * 13 for i in range(n_wav)]
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" +
           b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16) +
           b"data" + struct.pack("<I", len(data)))
    (out / "tone.wav").write_bytes(hdr + data)
    pd.DataFrame({
        "idx": pd.array(range(n_wav), dtype="int64"),
        "value": [s / 32768.0 for s in samples],
    }).to_parquet(out / "wav_frame.parquet", index=False)

    # ---- img.ppm (q116): binary P6 PPM, 11x7 RGB, maxval 255, with a
    # header comment line (exercises the '#' skip). ppm_pixels.parquet is
    # the GENERATOR's decode (y, x, r, g, b from the same arrays) — the
    # oracle frame, independent of the Scala decoder. All-integer values,
    # so the resize oracle (pure int index math) is exact on both engines.
    iw, ih = 11, 7
    pix = [((i * 7 + 3) % 256, (i * 13 + 5) % 256, (i * 29 + 11) % 256)
           for i in range(iw * ih)]
    ppm = (f"P6\n# graft fixture\n{iw} {ih}\n255\n".encode("ascii") +
           bytes(v for p in pix for v in p))
    (out / "img.ppm").write_bytes(ppm)
    pd.DataFrame(
        [(i // iw, i % iw, p[0], p[1], p[2])
         for i, p in enumerate(pix)],
        columns=["y", "x", "r", "g", "b"]).astype("int64").to_parquet(
        out / "ppm_pixels.parquet", index=False)

    # ---- imgset/ (q122/q123): eight 16x12 P6 PPMs for perceptual-hash
    # dedup. img1 = img0 + uniform +10 per channel (no clamp: base values
    # are <= 235, and integer luma shifts by exactly +10, so the dHash is
    # IDENTICAL — the brightness-invariance witness). img2 = img0 with a
    # small localized patch rewrite (a near-duplicate at low Hamming
    # distance). img3..img7 are independent pseudo-random images (far
    # hashes). imgset_pixels.parquet is the GENERATOR's decode (img, y, x,
    # r, g, b) — the oracle frame, independent of the Scala decoder;
    # all-integer, so the luma/resize/compare oracle is exact everywhere.
    sw, sh = 16, 12

    def ppm_bytes(pix):
        return (f"P6\n{sw} {sh}\n255\n".encode("ascii") +
                bytes(v for p in pix for v in p))

    def base_pix(seed):
        return [(((i * 7 + seed * 31 + 3) % 236),
                 ((i * 13 + seed * 17 + 5) % 236),
                 ((i * 29 + seed * 11 + 7) % 236))
                for i in range(sw * sh)]

    imgset = out / "imgset"
    imgset.mkdir(exist_ok=True)
    img0 = base_pix(0)
    variants = {
        "img0": img0,
        "img1": [(r + 10, g + 10, b + 10) for (r, g, b) in img0],
        "img2": [(255, 255, 255) if (4 <= i // sw <= 8 and 4 <= i % sw <= 7)
                 else p for i, p in enumerate(img0)],
    }
    for s in range(3, 8):
        variants[f"img{s}"] = base_pix(s * 97 + 13)
    rows = []
    for name, pix in variants.items():
        (imgset / f"{name}.ppm").write_bytes(ppm_bytes(pix))
        rows += [(name, i // sw, i % sw, p[0], p[1], p[2])
                 for i, p in enumerate(pix)]
    df = pd.DataFrame(rows, columns=["img", "y", "x", "r", "g", "b"])
    for c in ["y", "x", "r", "g", "b"]:
        df[c] = df[c].astype("int64")
    df.to_parquet(out / "imgset_pixels.parquet", index=False)

    print(f"io fixtures -> {out}")


if __name__ == "__main__":
    main()
