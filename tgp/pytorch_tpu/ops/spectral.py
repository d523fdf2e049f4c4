"""Empirical spectral density estimation (spectral-mixture kernel init).

reference: code/dsp/utils.py:58-97 (`estimate_spectral_density`): rFFT
periodogram of evenly-spaced observations, peak picking, returning the peak
frequencies and periods used to seed periodic/cosine mixture components.
"""

from __future__ import annotations

import numpy as np


def estimate_spectral_density(x, y, prominence: float = 1000.0):
    """Peak frequencies/periods of the empirical spectral density.

    Args:
      x: (N,) evenly-spaced inputs; y: (N,) observations.
    Returns (freqs, periods) lists.
    """
    from scipy.signal import find_peaks

    x = np.squeeze(np.asarray(x))
    y = np.squeeze(np.asarray(y))
    N = x.shape[0]
    emp_spect = np.abs(np.fft.rfft(y) ** 2) / N
    freq = np.fft.rfftfreq(N, d=abs(x[1] - x[0]))
    peaks, _ = find_peaks(emp_spect, prominence=prominence)
    freqs = [freq[i] for i in peaks]
    periods = [1.0 / f for f in freqs if f != 0]
    return freqs, periods
