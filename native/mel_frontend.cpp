// Native batch mel/MFCC front-end for host-side data preprocessing.
//
// The reference computes MFCCs clip-by-clip through librosa's Python stack
// (utils/common.py:340-349) — the slowest part of building the TED-db
// caches. This C++ implementation processes a whole batch of equal-length
// clips: reflect-pad -> frame -> window -> radix-2 FFT -> power -> mel
// projection -> power_to_db (per-clip top_db clamp) -> DCT -> /1000 ->
// coefficient-axis deltas, writing the (3*n_mfcc-5, T) feature block per
// clip.
//
// Numerical parity: the window, mel filterbank and DCT matrices are
// *supplied by the caller* (computed once in Python by ops/dsp_ref.py), so
// the constants are bit-identical to the numpy/JAX paths; only the FFT and
// reductions are re-implemented here.
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// In-place iterative radix-2 complex FFT (decimation in time).
void fft_radix2(float* re, float* im, long n, const float* tw_re,
                const float* tw_im) {
  // bit-reversal permutation
  for (long i = 1, j = 0; i < n; ++i) {
    long bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (long len = 2; len <= n; len <<= 1) {
    long step = n / len;
    for (long i = 0; i < n; i += len) {
      for (long k = 0; k < len / 2; ++k) {
        float wr = tw_re[k * step];
        float wi = tw_im[k * step];
        long a = i + k, b = i + k + len / 2;
        float xr = re[b] * wr - im[b] * wi;
        float xi = re[b] * wi + im[b] * wr;
        re[b] = re[a] - xr;
        im[b] = im[a] - xi;
        re[a] += xr;
        im[a] += xi;
      }
    }
  }
}

inline long reflect_index(long i, long n) {
  // numpy 'reflect' (no edge repeat): period 2n-2
  if (n == 1) return 0;
  long period = 2 * (n - 1);
  i = ((i % period) + period) % period;
  return i < n ? i : period - i;
}

// Real-input FFT via the half-size complex trick: pack even/odd samples
// into an N/2-point complex FFT, then untwist to the N/2+1 real-spectrum
// bins. ~2x the throughput of a full complex FFT on real input.
struct RFFT {
  long n;                       // full (real) FFT size
  std::vector<float> tw_re, tw_im;    // twiddles for the N/2 complex FFT
  std::vector<float> ut_re, ut_im;    // untwist factors e^{-2pi i k / N}

  explicit RFFT(long n_fft) : n(n_fft) {
    long h = n / 2;
    tw_re.resize(h / 2);
    tw_im.resize(h / 2);
    for (long k = 0; k < h / 2; ++k) {
      double ang = -2.0 * M_PI * k / h;
      tw_re[k] = static_cast<float>(std::cos(ang));
      tw_im[k] = static_cast<float>(std::sin(ang));
    }
    ut_re.resize(h + 1);
    ut_im.resize(h + 1);
    for (long k = 0; k <= h; ++k) {
      double ang = -2.0 * M_PI * k / n;
      ut_re[k] = static_cast<float>(std::cos(ang));
      ut_im[k] = static_cast<float>(std::sin(ang));
    }
  }

  // x: n real samples; out_re/out_im: n/2+1 bins. scratch: 2 * (n/2).
  void forward(const float* x, float* out_re, float* out_im, float* zre,
               float* zim) const {
    long h = n / 2;
    for (long k = 0; k < h; ++k) {
      zre[k] = x[2 * k];
      zim[k] = x[2 * k + 1];
    }
    fft_radix2(zre, zim, h, tw_re.data(), tw_im.data());
    // untwist: X[k] = E + W*O where E/O are even/odd-sample spectra
    out_re[0] = zre[0] + zim[0];
    out_im[0] = 0.0f;
    out_re[h] = zre[0] - zim[0];
    out_im[h] = 0.0f;
    for (long k = 1; k < h; ++k) {
      float ar = zre[k], ai = zim[k];
      float br = zre[h - k], bi = -zim[h - k];  // conj(Z[h-k])
      float er = 0.5f * (ar + br), ei = 0.5f * (ai + bi);
      float or_ = 0.5f * (ai - bi), oi = -0.5f * (ar - br);  // (Z-conj)/2i
      out_re[k] = er + ut_re[k] * or_ - ut_im[k] * oi;
      out_im[k] = ei + ut_re[k] * oi + ut_im[k] * or_;
    }
  }
};

// Sparse row view of the triangular mel filterbank: each mel filter only
// touches a contiguous bin range, so the projection is O(2 * n_bins)
// instead of O(n_bins * n_mels).
struct SparseMel {
  std::vector<long> start, end;   // per-mel bin range [start, end)
  const float* fb;                // (n_mels, n_bins) row-major
  long n_bins;

  SparseMel(const float* mel_fb, long n_mels, long nb)
      : start(n_mels), end(n_mels), fb(mel_fb), n_bins(nb) {
    for (long m = 0; m < n_mels; ++m) {
      const float* row = mel_fb + m * nb;
      long s = 0;
      while (s < nb && row[s] == 0.0f) ++s;
      long e = nb;
      while (e > s && row[e - 1] == 0.0f) --e;
      start[m] = s;
      end[m] = e;
    }
  }

  void project(const float* power, float* mel_out, long n_mels) const {
    for (long m = 0; m < n_mels; ++m) {
      const float* row = fb + m * n_bins;
      float acc = 0.0f;
      for (long b = start[m]; b < end[m]; ++b) acc += row[b] * power[b];
      mel_out[m] = acc;
    }
  }
};

}  // namespace

extern "C" {

// audio:    (n_clips, n_samples) float32
// window:   (n_fft,)             Hann window
// mel_fb:   (n_mels, n_bins)     Slaney mel filterbank (row-major)
// dct:      (n_mfcc, n_mels)     orthonormal DCT-II rows
// out:      (n_clips, 3*n_mfcc-5, n_frames) float32
// n_frames must equal 1 + n_samples / hop (centered STFT).
void mel_mfcc_batch(const float* audio, long n_clips, long n_samples,
                    const float* window, long n_fft, long hop,
                    const float* mel_fb, long n_mels, long n_bins,
                    const float* dct, long n_mfcc, float* out,
                    long n_frames) {
  const long n_combined = 3 * n_mfcc - 5;
  const long pad = n_fft / 2;
  const float amin = 1e-10f;
  const float top_db = 80.0f;

  RFFT rfft(n_fft);
  SparseMel smel(mel_fb, n_mels, n_bins);
  std::vector<float> frame(n_fft), zre(n_fft / 2), zim(n_fft / 2);
  std::vector<float> sre(n_bins), sim(n_bins), power(n_bins);
  std::vector<float> mel_power(n_frames * n_mels);
  std::vector<float> s_db(n_frames * n_mels);
  std::vector<float> mfcc(n_mfcc * n_frames);

  for (long c = 0; c < n_clips; ++c) {
    const float* clip = audio + c * n_samples;

    // ---- STFT power -> mel, frame by frame ----
    for (long f = 0; f < n_frames; ++f) {
      long start = f * hop - pad;
      for (long i = 0; i < n_fft; ++i) {
        long idx = start + i;
        float v = (idx >= 0 && idx < n_samples)
                      ? clip[idx]
                      : clip[reflect_index(idx, n_samples)];
        frame[i] = v * window[i];
      }
      rfft.forward(frame.data(), sre.data(), sim.data(), zre.data(),
                   zim.data());
      for (long b = 0; b < n_bins; ++b) {
        power[b] = sre[b] * sre[b] + sim[b] * sim[b];
      }
      smel.project(power.data(), mel_power.data() + f * n_mels, n_mels);
    }

    // ---- power_to_db with per-clip top_db clamp (ref=1.0) ----
    float max_db = -1e30f;
    for (long i = 0; i < n_frames * n_mels; ++i) {
      float v = 10.0f * std::log10(std::max(amin, mel_power[i]));
      s_db[i] = v;
      if (v > max_db) max_db = v;
    }
    float floor_db = max_db - top_db;
    for (long i = 0; i < n_frames * n_mels; ++i) {
      if (s_db[i] < floor_db) s_db[i] = floor_db;
    }

    // ---- DCT over the mel axis -> (n_mfcc, n_frames), scaled by 1/1000 ----
    for (long k = 0; k < n_mfcc; ++k) {
      const float* drow = dct + k * n_mels;
      for (long f = 0; f < n_frames; ++f) {
        const float* srow = s_db.data() + f * n_mels;
        float acc = 0.0f;
        for (long m = 0; m < n_mels; ++m) acc += drow[m] * srow[m];
        mfcc[k * n_frames + f] = acc * 1e-3f;
      }
    }

    // ---- combined features: mfcc | d1 (m[2:]-m[1:-1]) | d2 (d1 diff) ----
    float* dst = out + c * n_combined * n_frames;
    std::memcpy(dst, mfcc.data(), sizeof(float) * n_mfcc * n_frames);
    float* d1 = dst + n_mfcc * n_frames;
    for (long k = 0; k < n_mfcc - 2; ++k) {
      for (long f = 0; f < n_frames; ++f) {
        d1[k * n_frames + f] =
            mfcc[(k + 2) * n_frames + f] - mfcc[(k + 1) * n_frames + f];
      }
    }
    float* d2 = d1 + (n_mfcc - 2) * n_frames;
    for (long k = 0; k < n_mfcc - 3; ++k) {
      for (long f = 0; f < n_frames; ++f) {
        d2[k * n_frames + f] = d1[(k + 1) * n_frames + f] - d1[k * n_frames + f];
      }
    }
  }
}

// Log-mel spectrogram batch (ref utils/ted_db_utils.py:38-42 semantics:
// power_to_db with ref = per-clip max). out: (n_clips, n_mels, n_frames).
void log_mel_batch(const float* audio, long n_clips, long n_samples,
                   const float* window, long n_fft, long hop,
                   const float* mel_fb, long n_mels, long n_bins, float* out,
                   long n_frames) {
  const long pad = n_fft / 2;
  const float amin = 1e-10f;
  const float top_db = 80.0f;

  RFFT rfft(n_fft);
  SparseMel smel(mel_fb, n_mels, n_bins);
  std::vector<float> frame(n_fft), zre(n_fft / 2), zim(n_fft / 2);
  std::vector<float> sre(n_bins), sim(n_bins), power(n_bins);
  std::vector<float> mel_power(n_frames * n_mels);

  for (long c = 0; c < n_clips; ++c) {
    const float* clip = audio + c * n_samples;
    float max_power = amin;
    for (long f = 0; f < n_frames; ++f) {
      long start = f * hop - pad;
      for (long i = 0; i < n_fft; ++i) {
        long idx = start + i;
        float v = (idx >= 0 && idx < n_samples)
                      ? clip[idx]
                      : clip[reflect_index(idx, n_samples)];
        frame[i] = v * window[i];
      }
      rfft.forward(frame.data(), sre.data(), sim.data(), zre.data(),
                   zim.data());
      for (long b = 0; b < n_bins; ++b) {
        power[b] = sre[b] * sre[b] + sim[b] * sim[b];
      }
      float* mp = mel_power.data() + f * n_mels;
      smel.project(power.data(), mp, n_mels);
      for (long m = 0; m < n_mels; ++m) {
        if (mp[m] > max_power) max_power = mp[m];
      }
    }
    float ref_db = 10.0f * std::log10(std::max(amin, max_power));
    float* dst = out + c * n_mels * n_frames;
    float max_db = -1e30f;
    for (long f = 0; f < n_frames; ++f) {
      for (long m = 0; m < n_mels; ++m) {
        float v =
            10.0f * std::log10(std::max(amin, mel_power[f * n_mels + m])) -
            ref_db;
        dst[m * n_frames + f] = v;
        if (v > max_db) max_db = v;
      }
    }
    float floor_db = max_db - top_db;
    for (long i = 0; i < n_mels * n_frames; ++i) {
      if (dst[i] < floor_db) dst[i] = floor_db;
    }
  }
}

}  // extern "C"
