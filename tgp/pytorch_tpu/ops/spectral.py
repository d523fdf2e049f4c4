"""Empirical spectral density estimation (spectral-mixture kernel init).

reference: code/dsp/utils.py:58-97 (`estimate_spectral_density`): rFFT
periodogram of evenly-spaced observations, peak picking, returning the peak
frequencies and periods used to seed periodic/cosine mixture components.
"""

from __future__ import annotations

import numpy as np


def estimate_spectral_density(x, y, prominence: float = 1000.0,
                              return_power: bool = False):
    """Peak frequencies/periods of the empirical spectral density.

    Args:
      x: (N,) evenly-spaced inputs; y: (N,) observations.
      return_power: additionally return the periodogram power at each peak
        (for top-K component selection when seeding spectral-mixture
        kernels — the reference hand-tunes `prominence` per corpus instead,
        code/dsp/utils.py:58-97).
    Returns (freqs, periods) lists, plus `powers` when return_power.
    """
    from scipy.signal import find_peaks

    x = np.squeeze(np.asarray(x))
    y = np.squeeze(np.asarray(y))
    N = x.shape[0]
    emp_spect = np.abs(np.fft.rfft(y) ** 2) / N
    freq = np.fft.rfftfreq(N, d=abs(x[1] - x[0]))
    peaks, _ = find_peaks(emp_spect, prominence=prominence)
    # skip the zero-frequency bin ENTIRELY so freqs/periods/powers stay
    # aligned parallel lists (callers argsort powers and index periods);
    # find_peaks cannot pick index 0 of an rfft grid today, but a filter
    # on one list only would silently desynchronize them if that changes
    peaks = [i for i in peaks if freq[i] != 0]
    freqs = [freq[i] for i in peaks]
    periods = [1.0 / f for f in freqs]
    if return_power:
        powers = [float(emp_spect[i]) for i in peaks]
        return freqs, periods, powers
    return freqs, periods
