#!/usr/bin/env python3
"""Generate golden DSP vectors for the Scala spec (dev-time only; the Scala
library never depends on Python). Re-implements the reference semantics
(/root/reference/src/process_nwb) with numpy.fft on deterministic inputs and
dumps expected outputs to src/test/resources/dsp_golden.json.
"""
import json
import numpy as np


def next_fast_len(n):
    if n <= 6:
        return max(n, 1)
    best = float('inf')
    p5 = 1
    while p5 < best:
        p35 = p5
        while p35 < best:
            q = -(-n // p35)
            p2 = 1
            while p2 < q:
                p2 <<= 1
            c = p2 * p35
            if c == n:
                return n
            if c < best:
                best = c
            p35 *= 3
        p5 *= 5
    return int(best)


def npads(n_time, npad, ratio=1.0):
    if npad == 'fast':
        t = next_fast_len(n_time) - n_time
        pads = np.array([t // 2, t // 2 + t % 2], int)
    elif npad == 'auto':
        min_add = min(n_time // 8, 100) * 2
        p = 1
        while p < n_time + min_add:
            p <<= 1
        t = p - n_time
        pads = np.array([t // 2, t // 2 + t % 2], int)
    else:
        pads = np.array([npad, npad], int)
    orig_len = n_time + pads.sum()
    new_len = int(round(ratio * orig_len))
    final_len = int(round(ratio * n_time))
    to_removes = [int(round(ratio * pads[0]))]
    to_removes.append(new_len - final_len - to_removes[0])
    return pads, np.array(to_removes), new_len


def smart_pad(x, pads):
    if (pads == 0).all():
        return x
    lz = np.zeros(max(pads[0] - len(x) + 1, 0))
    rz = np.zeros(max(pads[1] - len(x) + 1, 0))
    return np.concatenate([lz, 2 * x[0] - x[pads[0]:0:-1], x,
                           2 * x[-1] - x[-2:-pads[1] - 2:-1], rz])


def trim(x, tr):
    if (tr > 0).any():
        x = x[tr[0]:len(x) - tr[1]]
    return x


def resample_func(x, num, npad='fast'):
    n_time = len(x)
    ratio = float(num) / n_time
    pads, to_removes, new_len = npads(n_time, npad, ratio)
    x = smart_pad(x, pads)
    old_len = len(x)
    shorter = new_len < old_len
    use_len = new_len if shorter else old_len
    xf = np.fft.rfft(x)
    if use_len % 2 == 0:
        nyq = use_len // 2
        if nyq < len(xf):
            xf[nyq] *= 2 if shorter else 0.5
    xf *= ratio
    y = np.fft.irfft(xf, n=new_len)
    return trim(y, to_removes)


def resample(x, new_freq, old_freq, npad='fast'):
    num = int(np.ceil(len(x) * new_freq / old_freq))
    return resample_func(x, num, npad)


def notch(x, rate, noise_hz=60.0, npad='fast'):
    nyquist = rate / 2.0
    if nyquist < noise_hz:
        return x
    delta = 1.0
    pads, to_removes, _ = npads(len(x), npad)
    x = smart_pad(x, pads)
    fs = np.fft.rfftfreq(len(x), 1.0 / rate)
    fd = np.fft.rfft(x)
    for f0 in np.arange(noise_hz, nyquist, noise_hz):
        mask = np.logical_and(fs > f0 - delta, fs < f0 + delta)
        win = np.hamming(mask.sum())
        fd[mask] *= (1.0 - win)
    y = np.fft.irfft(fd, n=len(x))
    return trim(y, to_removes)


def gaussian(n_time, rate, center, sd):
    freq = np.fft.fftfreq(n_time, 1.0 / rate)
    k = np.exp((-(np.abs(freq) - center) ** 2) / (2 * sd ** 2))
    return k / np.linalg.norm(k)


def wavelet(x, rate, cfs_sds, npad='fast'):
    pads, to_removes, _ = npads(len(x), npad)
    xp = smart_pad(x, pads)
    n = len(xp)
    freq = np.fft.fftfreq(n, 1.0 / rate)
    h = np.zeros(n)
    h[freq > 0] = 2.0
    xfh = np.fft.fft(xp) * h
    out = []
    for cf, sd in cfs_sds:
        f = gaussian(n, rate, cf, sd)
        z = np.fft.ifft(xfh * f)
        z = trim(z, to_removes)
        out.append({'re': z.real.tolist(), 'im': z.imag.tolist()})
    return out


def sig(n, seed):
    # deterministic pseudo-signal both sides can regenerate exactly
    i = np.arange(n, dtype=float)
    return (np.sin(0.01 * i + seed) + 0.5 * np.sin(0.1 * i * (seed + 1))
            + 0.25 * np.cos(0.55 * i) + 0.001 * i)


cases = {}
for n in [100, 101, 999, 1000, 1024]:
    x = sig(n, 1)
    cases[f'nextFastLen_{n}'] = next_fast_len(n)
    p, t, nl = npads(n, 'fast', 0.5)
    cases[f'padPlan_fast_r0.5_{n}'] = [int(p[0]), int(p[1]), int(t[0]), int(t[1]), nl]
    p, t, nl = npads(n, 'auto', 1.5)
    cases[f'padPlan_auto_r1.5_{n}'] = [int(p[0]), int(p[1]), int(t[0]), int(t[1]), nl]

x = sig(200, 2)
cases['smartPad_7_4'] = smart_pad(x, np.array([7, 4])).tolist()
xs = sig(5, 3)
cases['smartPad_overlong_9_8'] = smart_pad(xs, np.array([9, 8])).tolist()

for (n, newf, oldf) in [(999, 100.0, 200.0), (1000, 100.0, 200.0),
                        (1000, 300.0, 200.0), (5077, 211.0, 400.0),
                        (1000, 200.0, 200.0)]:
    x = sig(n, 4)
    cases[f'resample_{n}_{newf}_{oldf}'] = resample(x, newf, oldf).tolist()

for (n, rate) in [(2000, 400.0), (2048, 512.0), (1999, 1000.0)]:
    x = sig(n, 5)
    cases[f'notch_{n}_{rate}'] = notch(x, rate).tolist()

x = sig(1500, 6)
cases['wavelet_1500_400'] = wavelet(x, 400.0, [(75.0, 9.375), (120.0, 15.0)])
cases['gaussian_1024_400_75'] = gaussian(1024, 400.0, 75.0, 9.375).tolist()

with open('/root/repo/src/test/resources/dsp_golden.json', 'w') as f:
    json.dump(cases, f)
print('wrote', len(cases), 'cases')
