// Fast piano-roll -> note-event extraction (host-side native codec).
//
// C++ implementation of the onset-aware velocity-change scan in
// data/pianoroll.py::roll_to_midi (itself a re-architecture of
// music_rule_guidance/piano_roll_to_chord.py:167-275). The Python scan is
// O(pitch x time) with per-event interpreter overhead; batch MIDI export of
// generated samples is dominated by it. This codec is exact-semantics
// compatible — tests compare both paths event-for-event.
//
// Built with: g++ -O3 -shared -fPIC roll_codec.cpp -o libroll_codec.so
// Bound via ctypes (no pybind11 in this environment).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Extract note events from one (128, n_frames) velocity roll (+ optional
// onset roll). Rolls are float32 in [0, 127]. Returns the number of notes
// written (or -1 if out_capacity was exceeded).
//
// Semantics mirror roll_to_midi:
//  * values <= background (max over pitches < min_pitch) are silenced
//  * note spans = maximal runs of nonzero velocity per pitch
//  * with onset_roll: spans are split at onset columns (value >= 64 kept by
//    the caller; here any nonzero counts since the caller pre-thresholds),
//    spans containing no onset are dropped
//  * start/end times are frame indices / fs, velocity = first frame's value
int extract_notes(
    const float* piano_roll,      // (128 * n_frames), row-major per pitch
    const float* onset_roll,      // same layout or nullptr
    int n_pitch,
    int n_frames,
    float fs,
    int min_pitch,
    int32_t* out_pitch,
    int32_t* out_velocity,
    double* out_start,
    double* out_end,
    int out_capacity) {
  // background level = max over rows below min_pitch (piano_roll_to_chord
  // :203-204); values <= background become 0
  float background = 0.0f;
  for (int p = 0; p < min_pitch && p < n_pitch; ++p) {
    const float* row = piano_roll + (size_t)p * n_frames;
    for (int tcol = 0; tcol < n_frames; ++tcol) {
      if (row[tcol] > background) background = row[tcol];
    }
  }

  int count = 0;
  std::vector<int> onset_cols;
  for (int p = 0; p < n_pitch; ++p) {
    const float* row = piano_roll + (size_t)p * n_frames;
    const float* orow =
        onset_roll ? onset_roll + (size_t)p * n_frames : nullptr;
    int start = -1;
    float vel = 0.0f;
    for (int tcol = 0; tcol <= n_frames; ++tcol) {
      float v = (tcol < n_frames) ? row[tcol] : 0.0f;
      bool active = v > background;
      if (active && start < 0) {
        start = tcol;
        vel = v;
      } else if (!active && start >= 0) {
        int end = tcol;
        if (orow) {
          // collect onset columns in [start, end] (inclusive end, matching
          // the python slice onset_roll[note, start:end+1])
          onset_cols.clear();
          int hi = end < n_frames - 1 ? end : n_frames - 1;
          for (int c = start; c <= hi; ++c) {
            if (orow[c] != 0.0f) onset_cols.push_back(c);
          }
          for (size_t i = 0; i < onset_cols.size(); ++i) {
            double s = onset_cols[i] / (double)fs;
            double e = (i + 1 < onset_cols.size())
                           ? onset_cols[i + 1] / (double)fs
                           : end / (double)fs;
            if (count >= out_capacity) return -1;
            out_pitch[count] = p;
            out_velocity[count] = (int32_t)vel;
            out_start[count] = s;
            out_end[count] = e;
            ++count;
          }
        } else {
          if (count >= out_capacity) return -1;
          out_pitch[count] = p;
          out_velocity[count] = (int32_t)vel;
          out_start[count] = start / (double)fs;
          out_end[count] = end / (double)fs;
          ++count;
        }
        start = -1;
      }
    }
  }
  return count;
}

// Batch piano-roll rasterization: notes -> velocity+onset rolls.
// Inverse codec used by midi_to_roll's hot loop.
void rasterize_notes(
    const int32_t* pitches,
    const int32_t* velocities,
    const double* starts,
    const double* ends,
    int n_notes,
    float fs,
    int n_frames,
    float* piano_roll,   // (128 * n_frames), pre-zeroed
    float* onset_roll) { // (128 * n_frames), pre-zeroed
  for (int i = 0; i < n_notes; ++i) {
    int p = pitches[i];
    if (p < 0 || p > 127) continue;
    int s = (int)(starts[i] * fs);
    int e = (int)(ends[i] * fs);
    if (s >= n_frames) continue;
    if (e > n_frames) e = n_frames;
    float* row = piano_roll + (size_t)p * n_frames;
    for (int c = s; c < e; ++c) row[c] += (float)velocities[i];
    int oc = s < n_frames - 1 ? s : n_frames - 1;
    onset_roll[(size_t)p * n_frames + oc] = 127.0f;
  }
  // clip to [0, 127] like the pretty_midi aggregation
  size_t total = (size_t)128 * n_frames;
  for (size_t i = 0; i < total; ++i) {
    if (piano_roll[i] > 127.0f) piano_roll[i] = 127.0f;
  }
}

}  // extern "C"

extern "C" {

// Full per-item training augmentation in one native pass — the host-side
// data-loader hot path (data/datasets.py::PianoRollDataset.__getitem__):
// normalize (v/63.5 - 1), crop [start, start+pr_len), onset-preserving
// time-stretch/compress to image_size, circular pitch shift on channels
// 0-1 (the reference's key_shift quirk: both signs of k shift the same
// way — pr_datasets_all.py:99-102 — reproduced exactly), and the
// piano-range clamp. Randomness (pr_len, start, k) stays in the Python
// caller so numpy and native paths are cross-testable draw-for-draw.
//
// src: (3, 128, t_src) uint8 row-major; out: (3, 128, image_size) float32.
void augment_roll(
    const uint8_t* src,
    int t_src,
    int image_size,
    int pr_len,
    int start,
    int k_shift,
    int do_stretch,
    int min_pitch,
    int max_pitch,
    float* out) {
  const int P = 128;
  // staging buffer: resized-but-unshifted (3, 128, image_size)
  std::vector<float> buf((size_t)3 * P * image_size, -1.0f);
  auto srow = [&](int ch, int p) {
    return src + ((size_t)ch * P + p) * t_src;
  };
  auto brow = [&](int ch, int p) {
    return buf.data() + ((size_t)ch * P + p) * image_size;
  };

  if (!do_stretch) {
    // plain crop to the first image_size columns (+ background pad)
    int ncopy = t_src < image_size ? t_src : image_size;
    for (int ch = 0; ch < 3; ++ch)
      for (int p = 0; p < P; ++p) {
        const uint8_t* r = srow(ch, p);
        float* o = brow(ch, p);
        for (int i = 0; i < ncopy; ++i) o[i] = r[i] / 63.5f - 1.0f;
      }
  } else if (pr_len < image_size) {
    // stretch: nearest-resize piano+pedal; re-place onsets without
    // duplicates at the first output column of each source column
    for (int p = 0; p < P; ++p) {
      const uint8_t* rp = srow(0, p);
      const uint8_t* ro = srow(1, p);
      const uint8_t* rd = srow(2, p);
      float* op = brow(0, p);
      float* oo = brow(1, p);
      float* od = brow(2, p);
      int prev_j = -1;
      for (int i = 0; i < image_size; ++i) {
        int j = (int)((double)i / image_size * pr_len);
        op[i] = rp[start + j] / 63.5f - 1.0f;
        od[i] = rd[start + j] / 63.5f - 1.0f;
        oo[i] = (j != prev_j) ? ro[start + j] / 63.5f - 1.0f : -1.0f;
        prev_j = j;
      }
    }
  } else {
    // compress (or equal): nearest-resize everything, re-add onsets that
    // got dropped wherever the piano velocity increases column-to-column
    for (int p = 0; p < P; ++p) {
      for (int ch = 0; ch < 3; ++ch) {
        const uint8_t* r = srow(ch, p);
        float* o = brow(ch, p);
        for (int i = 0; i < image_size; ++i) {
          int j = (int)((int64_t)i * pr_len / image_size);
          o[i] = r[start + j] / 63.5f - 1.0f;
        }
      }
      if (pr_len > image_size) {  // equal-length crop re-adds nothing
        float* op = brow(0, p);
        float* oo = brow(1, p);
        float prev = op[0];
        for (int i = 0; i < image_size; ++i) {
          if (op[i] - prev > 0.0f) oo[i] = 1.0f;
          prev = op[i];
        }
      }
    }
  }

  // circular pitch shift on channels 0-1 (new[p] = buf[(p + |k|) % 128],
  // matching concat([x[|k|:], x[:|k|]]) for either sign), then the
  // piano-range clamp; pedal passes through (also clamped).
  int shift = k_shift < 0 ? -k_shift : k_shift;
  for (int ch = 0; ch < 3; ++ch) {
    for (int p = 0; p < P; ++p) {
      int src_p = (ch < 2) ? (p + shift) % P : p;
      float* o = out + ((size_t)ch * P + p) * image_size;
      if (p < min_pitch || p > max_pitch) {
        for (int i = 0; i < image_size; ++i) o[i] = -1.0f;
      } else {
        std::memcpy(o, brow(ch, src_p), sizeof(float) * image_size);
      }
    }
  }
}

}  // extern "C"
