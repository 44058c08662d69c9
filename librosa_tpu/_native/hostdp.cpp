// Native host-side sequential DPs.
//
// The beat tracker's dynamic program (reference beat.py:619,
// __beat_track_dp — a numba njit there) is a strictly sequential scalar
// recurrence over the onset envelope: frame i scans a ~1.5·fpb window of
// prior cumscores.  It cannot ride the MXU and a pure-Python loop costs
// ~25 µs/frame of interpreter overhead (~33 ms on a 30 s envelope), so
// it belongs in the native runtime next to the audio decoder.  The
// recurrence here is bit-identical to beat._beat_dp_host: same window
// bounds, same log-squared deviation penalty, same first-beat threshold
// gating, first-index tie-breaking like np.argmax.

#include <cmath>
#include <cstdint>

extern "C" void lt_beat_dp(const double *localscore, long T,
                           const double *fpb, int tv, double tightness,
                           int64_t *backlink, double *cumscore) {
  if (T <= 0) return;
  // True max like localscore.max(): envelopes can be all-negative, so the
  // running max must start below any value, not at zero.
  double score_thresh = -HUGE_VAL;
  for (long i = 0; i < T; ++i)
    if (localscore[i] > score_thresh) score_thresh = localscore[i];
  score_thresh *= 0.01;

  bool first_beat = true;
  for (long i = 0; i < T; ++i) {
    const double f = fpb[tv ? i : 0];
    long lo = (long)(i - 2.0 * f);
    if (lo < 0) lo = 0;
    // hi is exclusive: i - round(f/2) + 1, with numpy banker's rounding
    // on the half (f/2 of an integral f is x.0 or x.5; np.round rounds
    // .5 to even)
    const double half = f * 0.5;
    double rounded = std::nearbyint(half);  // ties-to-even in default mode
    long hi = i - (long)rounded + 1;
    // Only d = i - loc >= 1 candidates are valid (d == 0 would read
    // cumscore[i] before it is written — an uninitialized value).
    if (hi > i) hi = i;

    double best_score = -HUGE_VAL;
    long best_loc = -1;
    for (long loc = lo; loc < hi; ++loc) {
      const long d = i - loc;
      const double dev = std::log((double)d) - std::log(f);
      const double s = cumscore[loc] - tightness * dev * dev;
      if (s > best_score) {  // strict: keep the first max, like np.argmax
        best_score = s;
        best_loc = loc;
      }
    }

    long beat_loc = -1;
    if (best_loc >= 0 && std::isfinite(best_score) && (i - best_loc) >= 1) {
      cumscore[i] = localscore[i] + best_score;
      beat_loc = best_loc;
    } else {
      cumscore[i] = localscore[i];
    }
    if (first_beat && localscore[i] < score_thresh) {
      backlink[i] = -1;
    } else {
      backlink[i] = beat_loc;
      first_beat = false;
    }
  }
}
