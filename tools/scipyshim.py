#!/usr/bin/env python3
"""Pure-numpy stand-ins for the scipy (and misc) modules the reference
pipeline imports, so the reference implementations can run in this sandbox
(which has numpy/pandas but no scipy) to produce golden fixtures.

Implements the classical public algorithms scipy uses: zpk filter design
(Butterworth / Chebyshev I/II / elliptic via Landen/Jacobi), direct-form-II
transposed lfilter, odd-padded forward-backward filtfilt with steady-state
initial conditions, local-maxima peak finding with plateau/height/distance/
prominence selection, FFT hilbert, ndimage uniform_filter1d, and
FFT-domain resample. Install with `install()` BEFORE importing any
reference module.
"""
import cmath
import math
import sys
import types

import numpy as np


# ------------------------------------------------------------- zpk design
def _landen(k, tol=1e-15):
    seq = []
    while k > tol and len(seq) < 32:
        k = (k / (1 + math.sqrt(1 - k * k))) ** 2
        seq.append(k)
    return seq


def _cde(u, k):
    vs = _landen(k)
    w = cmath.cos(u * math.pi / 2)
    for v in reversed(vs):
        w = (1 + v) * w / (1 + v * w * w)
    return w


def _sne(u, k):
    vs = _landen(k)
    w = cmath.sin(u * math.pi / 2)
    for v in reversed(vs):
        w = (1 + v) * w / (1 + v * w * w)
    return w


def _asne(w, k):
    kp = k
    for kn in _landen(k):
        disc = cmath.sqrt(1 - (kp * w) ** 2)
        w = 2 * w / ((1 + kn) * (1 + disc))
        kp = kn
    return cmath.asin(w) * (2 / math.pi)


def _ellipdeg(n, k1):
    l = n // 2
    k1c = math.sqrt(1 - k1 * k1)
    prod = 1.0
    for i in range(1, l + 1):
        prod *= _sne((2.0 * i - 1) / n, k1c).real
    kc = (k1c ** n) * prod ** 4
    return math.sqrt(1 - kc * kc)


def _butter_ap(n):
    poles = [cmath.exp(1j * math.pi * (2 * m + n + 1) / (2 * n)) for m in range(n)]
    return [], poles, 1.0


def _cheby1_ap(n, rp):
    eps = math.sqrt(10 ** (0.1 * rp) - 1)
    mu = math.log((1.0 + math.sqrt(1.0 + eps * eps)) / eps) / n
    poles = []
    for m in range(n):
        theta = math.pi / 2.0 * (2.0 * (m + 1) - 1) / n
        poles.append(complex(-math.sinh(mu) * math.sin(theta),
                             math.cosh(mu) * math.cos(theta)))
    k = complex(1, 0)
    for p in poles:
        k *= -p
    k = k.real
    if n % 2 == 0:
        k /= math.sqrt(1.0 + eps * eps)
    return [], poles, k


def _cheby2_ap(n, rs):
    de = 1.0 / math.sqrt(10 ** (0.1 * rs) - 1)
    mu = math.asinh(1.0 / de) / n
    if n % 2 == 1:
        ms = [m for m in range(-(n - 1), n, 2) if m != 0]
    else:
        ms = list(range(-(n - 1), n, 2))
    zeros = [complex(0, -1.0 / math.sin(math.pi * m / (2.0 * n))) for m in ms]
    poles = []
    for m in range(n):
        theta = math.pi * (2 * m + 1) / (2.0 * n) + math.pi / 2.0
        base = cmath.exp(1j * theta)
        poles.append(1.0 / complex(math.sinh(mu) * base.real,
                                   math.cosh(mu) * base.imag))
    num = complex(1, 0)
    for z in zeros:
        num *= -z
    den = complex(1, 0)
    for p in poles:
        den *= -p
    return zeros, poles, (den / num).real


def _ellip_ap(n, rp, rs):
    eps_p = math.sqrt(10 ** (0.1 * rp) - 1)
    eps_s = math.sqrt(10 ** (0.1 * rs) - 1)
    k1 = eps_p / eps_s
    k = _ellipdeg(n, k1)
    l = n // 2
    zeros, poles = [], []
    v0 = _asne(1j / eps_p, k1) / n * -1j
    if n % 2 == 1:
        poles.append(1j * _sne(1j * v0, k))
    for i in range(1, l + 1):
        ui = (2.0 * i - 1) / n
        zi = 1j / (k * _cde(ui, k))
        pi = 1j * _cde(ui - 1j * v0, k)
        zeros += [zi, zi.conjugate()]
        poles += [pi, pi.conjugate()]
    num = complex(1, 0)
    for z in zeros:
        num *= -z
    den = complex(1, 0)
    for p in poles:
        den *= -p
    gain = (den / num).real
    if n % 2 == 0:
        gain *= 10 ** (-rp / 20.0)
    return zeros, poles, gain


def _lp2bp(z, p, k, w0, bw):
    degree = len(p) - len(z)
    zlp = [zz * (bw / 2) for zz in z]
    plp = [pp * (bw / 2) for pp in p]

    def split(x):
        d = cmath.sqrt(x * x - w0 * w0)
        return [x + d, x - d]

    zbp = [s for zz in zlp for s in split(zz)] + [0j] * degree
    pbp = [s for pp in plp for s in split(pp)]
    return zbp, pbp, k * bw ** degree


def _lp2lp(z, p, k, w0):
    return ([zz * w0 for zz in z], [pp * w0 for pp in p],
            k * w0 ** (len(p) - len(z)))


def _lp2hp(z, p, k, w0):
    zn = [w0 / zz for zz in z]
    pn = [w0 / pp for pp in p]
    extra = [0j] * (len(p) - len(z))
    num = complex(1, 0)
    for zz in z:
        num *= -zz
    den = complex(1, 0)
    for pp in p:
        den *= -pp
    return zn + extra, pn, k * (num / den).real


def _bilinear(z, p, k, fs):
    fs2 = 2.0 * fs
    degree = len(p) - len(z)
    zd = [(fs2 + zz) / (fs2 - zz) for zz in z] + [-1.0 + 0j] * degree
    pd = [(fs2 + pp) / (fs2 - pp) for pp in p]
    num = complex(1, 0)
    for zz in z:
        num *= fs2 - zz
    den = complex(1, 0)
    for pp in p:
        den *= fs2 - pp
    return zd, pd, k * (num / den).real


def _poly(roots):
    coeffs = [complex(1, 0)]
    for r in roots:
        nxt = [0j] * (len(coeffs) + 1)
        for i, c in enumerate(coeffs):
            nxt[i] += c
            nxt[i + 1] -= c * r
        coeffs = nxt
    return np.array([c.real for c in coeffs])


def _design(proto, wn, btype):
    z, p, k = proto
    fs = 2.0
    wn = np.atleast_1d(np.asarray(wn, dtype=float))
    warped = [2.0 * fs * math.tan(math.pi * w / fs) for w in wn]
    if btype in ("band", "bandpass"):
        w1, w2 = warped
        z, p, k = _lp2bp(z, p, k, math.sqrt(w1 * w2), w2 - w1)
    elif btype in ("low", "lowpass"):
        z, p, k = _lp2lp(z, p, k, warped[0])
    elif btype in ("high", "highpass"):
        z, p, k = _lp2hp(z, p, k, warped[0])
    else:
        raise NotImplementedError(btype)
    z, p, k = _bilinear(z, p, k, fs)
    return _poly(z) * k, _poly(p)


def butter(N, Wn, btype="low", analog=False, output="ba", fs=None):
    return _design(_butter_ap(N), Wn, btype)


def cheby1(N, rp, Wn, btype="low", **kw):
    return _design(_cheby1_ap(N, rp), Wn, btype)


def cheby2(N, rs, Wn, btype="low", **kw):
    return _design(_cheby2_ap(N, rs), Wn, btype)


def ellip(N, rp, rs, Wn, btype="low", **kw):
    # NOTE the reference calls ellip(N, rs=0.5, rp=40, ...) by keyword in
    # one spot; positional order here is scipy's (N, rp, rs, Wn).
    return _design(_ellip_ap(N, rp, rs), Wn, btype)


def iirnotch(w0, Q, fs=2.0):
    w = math.pi * w0 if fs == 2.0 else 2 * math.pi * w0 / fs
    alpha = math.sin(w) / (2.0 * Q)
    b = np.array([1.0, -2.0 * math.cos(w), 1.0])
    a = np.array([1.0 + alpha, -2.0 * math.cos(w), 1.0 - alpha])
    return b / a[0], a / a[0]


# -------------------------------------------------------------- filtering
def lfilter(b, a, x, zi=None):
    b = np.atleast_1d(np.asarray(b, dtype=float))
    a = np.atleast_1d(np.asarray(a, dtype=float))
    x = np.asarray(x, dtype=float)
    n = max(len(a), len(b))
    bn = np.concatenate([b, np.zeros(n - len(b))]) / a[0]
    an = np.concatenate([a, np.zeros(n - len(a))]) / a[0]
    z = np.zeros(n - 1) if zi is None else np.array(zi, dtype=float)
    y = np.empty_like(x)
    for i in range(len(x)):
        xi = x[i]
        yi = bn[0] * xi + (z[0] if n > 1 else 0.0)
        for j in range(n - 2):
            z[j] = bn[j + 1] * xi + z[j + 1] - an[j + 1] * yi
        if n > 1:
            z[n - 2] = bn[n - 1] * xi - an[n - 1] * yi
        y[i] = yi
    return y if zi is None else (y, z)


def lfilter_zi(b, a):
    b = np.atleast_1d(np.asarray(b, dtype=float))
    a = np.atleast_1d(np.asarray(a, dtype=float))
    n = max(len(a), len(b))
    bn = np.concatenate([b, np.zeros(n - len(b))]) / a[0]
    an = np.concatenate([a, np.zeros(n - len(a))]) / a[0]
    m = n - 1
    A = np.zeros((m, m))
    A[0, :] = -an[1:]
    A[1:, :-1] += np.eye(m - 1)
    B = bn[1:] - an[1:] * bn[0]
    return np.linalg.solve(np.eye(m) - A.T, B)


def filtfilt(b, a, x, padlen=None):
    b = np.atleast_1d(np.asarray(b, dtype=float))
    a = np.atleast_1d(np.asarray(a, dtype=float))
    x = np.asarray(x, dtype=float)
    ntaps = max(len(a), len(b))
    if padlen is None:
        padlen = 3 * ntaps
    if len(x) <= padlen:
        raise ValueError("input too short for padlen %d" % padlen)
    head = 2 * x[0] - x[padlen:0:-1]
    tail = 2 * x[-1] - x[-2:-padlen - 2:-1]
    ext = np.concatenate([head, x, tail])
    zi = lfilter_zi(b, a)
    fwd, _ = lfilter(b, a, ext, zi * ext[0])
    rev = fwd[::-1]
    bwd, _ = lfilter(b, a, rev, zi * rev[0])
    out = bwd[::-1]
    return out[padlen:padlen + len(x)]


def sosfiltfilt(*args, **kw):
    raise NotImplementedError("sosfiltfilt is unused by the golden paths")


# ------------------------------------------------------------- find_peaks
def _local_maxima(x):
    """Plateau-midpoint local maxima: (midpoints, left_edges, right_edges)."""
    mids, lefts, rights = [], [], []
    i, n = 1, len(x)
    while i < n - 1:
        if x[i - 1] < x[i]:
            j = i
            while j < n - 1 and x[j + 1] == x[i]:
                j += 1
            if j < n - 1 and x[j + 1] < x[i]:
                mids.append((i + j) // 2)
                lefts.append(i)
                rights.append(j)
                i = j
        i += 1
    return np.array(mids, dtype=int), np.array(lefts, dtype=int), \
        np.array(rights, dtype=int)


def _prominences(x, peaks):
    out = np.empty(len(peaks))
    n = len(x)
    for ix, p in enumerate(peaks):
        lmin = x[p]
        j = p - 1
        while j >= 0 and x[j] <= x[p]:
            lmin = min(lmin, x[j])
            j -= 1
        rmin = x[p]
        j = p + 1
        while j < n and x[j] <= x[p]:
            rmin = min(rmin, x[j])
            j += 1
        out[ix] = x[p] - max(lmin, rmin)
    return out


def _select_by_distance(x, peaks, distance):
    keep = np.ones(len(peaks), dtype=bool)
    priority = np.argsort(x[peaks], kind="stable")
    for idx in priority[::-1]:
        if not keep[idx]:
            continue
        j = idx - 1
        while j >= 0 and peaks[idx] - peaks[j] < distance:
            keep[j] = False
            j -= 1
        j = idx + 1
        while j < len(peaks) and peaks[j] - peaks[idx] < distance:
            keep[j] = False
            j += 1
    return keep


def find_peaks(x, height=None, distance=None, prominence=None,
               plateau_size=None):
    x = np.asarray(x, dtype=float)
    peaks, lefts, rights = _local_maxima(x)
    props = {}
    if plateau_size is not None:
        sizes = rights - lefts + 1
        lo, hi = plateau_size
        keep = np.ones(len(peaks), dtype=bool)
        if lo is not None:
            keep &= sizes >= lo
        if hi is not None:
            keep &= sizes <= hi
        peaks = peaks[keep]
    if height is not None:
        hmin = height[0] if isinstance(height, (tuple, list)) else height
        keep = np.ones(len(peaks), dtype=bool)
        if hmin is not None:
            keep &= x[peaks] >= hmin
        peaks = peaks[keep]
    if distance is not None:
        peaks = peaks[_select_by_distance(x, peaks, distance)]
    if prominence is not None:
        proms = _prominences(x, peaks)
        lo = prominence[0] if isinstance(prominence, (tuple, list)) else prominence
        if lo is not None:
            keep = proms >= lo
            peaks, proms = peaks[keep], proms[keep]
        props["prominences"] = proms
    return peaks, props


# ----------------------------------------------------------- misc signal
def hilbert(x):
    x = np.asarray(x, dtype=float)
    n = len(x)
    X = np.fft.fft(x)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1
        h[1:n // 2] = 2
    else:
        h[0] = 1
        h[1:(n + 1) // 2] = 2
    return np.fft.ifft(X * h)


def convolve(a, v, mode="full"):
    return np.convolve(a, v, mode=mode)


def resample(x, num):
    """FFT-domain resample (scipy.signal.resample semantics)."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    X = np.fft.fft(x)
    Y = np.zeros(num, dtype=complex)
    nmin = min(n, num)
    half = nmin // 2
    Y[:half + 1] = X[:half + 1]
    for k in range(1, (nmin + 1) // 2):
        Y[num - k] = X[n - k]
    if nmin % 2 == 0:
        if num < n:
            Y[half] = (X[half] + X[n - half]) * 0.5
            Y[num - half] = Y[half]
        elif num > n:
            Y[half] = X[half] * 0.5
            Y[num - half] = Y[half]
    y = np.fft.ifft(Y) * (num / n)
    return y.real


def firwin(*args, **kw):
    raise NotImplementedError("firwin is unused by the golden paths")


def resample_poly(*args, **kw):
    raise NotImplementedError("resample_poly is unused by the golden paths")


def uniform_filter1d(x, size, origin=0, mode="reflect"):
    """Trailing/centered uniform mean with scipy's window placement:
    window = [i - size//2 - origin, i + size - 1 - size//2 - origin],
    'reflect' boundary (symmetric padding)."""
    x = np.asarray(x, dtype=float)
    lo = size // 2 + origin
    pad = size  # enough for any |origin| <= size//2
    xp = np.concatenate([x[:pad][::-1], x, x[-pad:][::-1]])
    cs = np.concatenate([[0.0], np.cumsum(xp)])
    start = np.arange(len(x)) + pad - lo
    return (cs[start + size] - cs[start]) / size


class _Interp1d:
    def __init__(self, *args, **kw):
        raise NotImplementedError("interp1d is unused by the golden paths")


# ------------------------------------------------------------ installers
def install():
    """Insert fake scipy/tqdm/plotly/cvxopt/flirt modules into sys.modules."""
    scipy = types.ModuleType("scipy")
    signal = types.ModuleType("scipy.signal")
    for fn in (butter, cheby1, cheby2, ellip, filtfilt, find_peaks, hilbert,
               iirnotch, lfilter, lfilter_zi, sosfiltfilt, convolve, firwin,
               resample, resample_poly):
        setattr(signal, fn.__name__, fn)
    ndimage = types.ModuleType("scipy.ndimage")
    ndimage.uniform_filter1d = uniform_filter1d
    interpolate = types.ModuleType("scipy.interpolate")
    interpolate.interp1d = _Interp1d
    fftmod = types.ModuleType("scipy.fft")
    fftmod.fft = np.fft.fft
    fftmod.ifft = np.fft.ifft
    fftmod.fftfreq = np.fft.fftfreq
    scipy.signal = signal
    scipy.ndimage = ndimage
    scipy.interpolate = interpolate
    scipy.fft = fftmod
    for name, mod in [("scipy", scipy), ("scipy.signal", signal),
                      ("scipy.ndimage", ndimage),
                      ("scipy.interpolate", interpolate),
                      ("scipy.fft", fftmod)]:
        sys.modules[name] = mod

    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = lambda it, *a, **kw: it
    sys.modules["tqdm"] = tqdm_mod

    plotly = types.ModuleType("plotly")
    go = types.ModuleType("plotly.graph_objects")
    go.Figure = type("Figure", (), {})
    go.Scatter = type("Scatter", (), {})
    go.Bar = type("Bar", (), {})
    plotly.graph_objects = go
    sys.modules["plotly"] = plotly
    sys.modules["plotly.graph_objects"] = go

    cvxopt = types.ModuleType("cvxopt")
    sys.modules["cvxopt"] = cvxopt

    flirt = types.ModuleType("flirt")
    flirt_eda = types.ModuleType("flirt.eda")
    flirt_eda.get_eda_features = lambda *a, **kw: None
    flirt.eda = flirt_eda
    sys.modules["flirt"] = flirt
    sys.modules["flirt.eda"] = flirt_eda

    pv_pkg = types.ModuleType("physioview")
    pv_mod = types.ModuleType("physioview.physioview")
    pv_pkg.physioview = pv_mod
    sys.modules["physioview"] = pv_pkg
    sys.modules["physioview.physioview"] = pv_mod
