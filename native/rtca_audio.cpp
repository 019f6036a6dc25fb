// rtca_native: C++ host-side audio runtime for the realtime codec agent.
//
// The hot host-side op on the live input path is sample-rate conversion:
// WebRTC microphones deliver 48 kHz frames, the codec consumes 16 kHz, and a
// stateless per-chunk resample (scipy.signal.resample_poly on each 100 ms
// chunk) re-runs its filter over zero-padded chunk edges — audible boundary
// artifacts at every chunk seam plus redundant work. This module provides a
// STREAMING Kaiser-windowed-sinc polyphase resampler that carries filter
// history across process() calls, so chunked output equals one-shot output
// exactly (interior samples), plus a one-shot convenience entry point.
//
// Exposed via the CPython C API (no pybind11 in this image):
//   rtca_native.resampler_new(sr_in, sr_out) -> capsule
//   rtca_native.resampler_process(capsule, float32 bytes) -> float32 bytes
//   rtca_native.resampler_flush(capsule) -> float32 bytes
//   rtca_native.resample(float32 bytes, sr_in, sr_out) -> float32 bytes
//
// The Python-side wrapper (realtime_codec_agent_tpu/utils/native_audio.py)
// handles numpy views and falls back to an algorithm-identical numpy
// implementation when the extension is not built.
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <stdexcept>
#include <vector>

namespace {

double bessel_i0(double x) {
    // series expansion; converges quickly for the beta range we use
    double sum = 1.0, term = 1.0;
    const double x2 = x * x / 4.0;
    for (int k = 1; k < 64; ++k) {
        term *= x2 / (static_cast<double>(k) * k);
        sum += term;
        if (term < 1e-16 * sum) break;
    }
    return sum;
}

struct StreamingResampler {
    int up = 1, down = 1;
    int half_len = 0;        // filter half length (in upsampled-domain taps)
    int taps_per_phase = 0;  // input-domain taps per output sample
    std::vector<float> filt; // phase-major: filt[phase * taps_per_phase + k]
    std::vector<float> hist; // trailing input samples (taps_per_phase - 1)
    int64_t in_count = 0;    // total input samples consumed
    int64_t out_count = 0;   // total output samples produced

    StreamingResampler(int sr_in, int sr_out) {
        const int g = std::gcd(sr_in, sr_out);
        up = sr_out / g;
        down = sr_in / g;
        // scipy.signal.resample_poly's default design: 2*10*max(up,down)
        // upsampled-domain taps per side, Kaiser beta 5.0, cutoff at the
        // narrower Nyquist, gain up.
        const int max_rate = std::max(up, down);
        half_len = 10 * max_rate;
        const int n_taps = 2 * half_len + 1;
        const double fc = 1.0 / max_rate;  // normalized to upsampled Nyquist
        const double beta = 5.0;
        std::vector<double> h(n_taps);
        const double i0b = bessel_i0(beta);
        for (int i = 0; i < n_taps; ++i) {
            const double m = i - half_len;
            const double sinc =
                (m == 0.0) ? fc : std::sin(M_PI * fc * m) / (M_PI * m);
            const double r = m / half_len;
            const double win = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
            h[i] = sinc * win * up;
        }
        // polyphase decomposition: output m at upsampled position m*down
        // convolves h centered there; tap j of phase p touches input sample
        // floor((m*down + half_len)/up) - j
        taps_per_phase = (n_taps + up - 1) / up + 1;
        filt.assign(static_cast<size_t>(up) * taps_per_phase, 0.0f);
        // phase p = (m*down + half_len) % up; with anchor input
        // n0 = (m*down + half_len) / up, tap k touches input sample n0-k at
        // upsampled index (n0-k)*up, i.e. h index j = p + k*up
        for (int p = 0; p < up; ++p) {
            for (int k = 0; k < taps_per_phase; ++k) {
                const int64_t j = p + static_cast<int64_t>(k) * up;
                if (j < n_taps) {
                    filt[static_cast<size_t>(p) * taps_per_phase + k] =
                        static_cast<float>(h[j]);
                }
            }
        }
        hist.assign(taps_per_phase - 1, 0.0f);
    }

    // number of output samples available once `n_new` more inputs arrive
    int64_t available(int64_t n_new) const {
        // output m needs anchor input n0 = floor((m*down + half_len)/up)
        // to be < in_count + n_new  =>  m*down + half_len < (in_count+n_new)*up
        const int64_t limit =
            ((in_count + n_new) * up - half_len + down - 1) / down;
        return std::max<int64_t>(0, limit - out_count);
    }

    void process(const float* x, int64_t n, std::vector<float>& out) {
        const int64_t n_out = available(n);
        out.resize(n_out);
        // working buffer: history + new chunk; buf[i] = input sample
        // (in_count - hist_len + i)
        const int64_t hist_len = static_cast<int64_t>(hist.size());
        std::vector<float> buf(hist_len + n);
        std::memcpy(buf.data(), hist.data(), hist_len * sizeof(float));
        if (n > 0) std::memcpy(buf.data() + hist_len, x, n * sizeof(float));
        const int64_t base = in_count - hist_len;  // global index of buf[0]

        for (int64_t i = 0; i < n_out; ++i) {
            const int64_t m = out_count + i;
            const int64_t u = m * down;
            const int64_t n0 = (u + half_len) / up;  // anchor input sample
            const int phase = static_cast<int>((u + half_len) % up);
            const float* f = filt.data() + static_cast<size_t>(phase) * taps_per_phase;
            double acc = 0.0;
            for (int k = 0; k < taps_per_phase; ++k) {
                const int64_t src = n0 - k;
                if (src < base) break;  // before recorded history: zeros
                const int64_t idx = src - base;
                if (idx < static_cast<int64_t>(buf.size())) {
                    acc += static_cast<double>(f[k]) * buf[idx];
                }
            }
            out[i] = static_cast<float>(acc);
        }
        out_count += n_out;
        in_count += n;
        // retain trailing history
        const int64_t keep = std::min<int64_t>(hist_len, static_cast<int64_t>(buf.size()));
        hist.assign(buf.end() - keep, buf.end());
        if (keep < hist_len) {
            hist.insert(hist.begin(), hist_len - keep, 0.0f);
        }
    }

    void flush(std::vector<float>& out) {
        // feed zeros to drain the filter tail: enough to cover the delay
        const int64_t n_zero = taps_per_phase;
        std::vector<float> zeros(n_zero, 0.0f);
        process(zeros.data(), n_zero, out);
    }
};

void resampler_destroy(PyObject* capsule) {
    auto* r = static_cast<StreamingResampler*>(
        PyCapsule_GetPointer(capsule, "rtca_native.resampler"));
    delete r;
}

PyObject* py_resampler_new(PyObject*, PyObject* args) {
    int sr_in, sr_out;
    if (!PyArg_ParseTuple(args, "ii", &sr_in, &sr_out)) return nullptr;
    if (sr_in <= 0 || sr_out <= 0) {
        PyErr_SetString(PyExc_ValueError, "sample rates must be positive");
        return nullptr;
    }
    auto* r = new StreamingResampler(sr_in, sr_out);
    return PyCapsule_New(r, "rtca_native.resampler", resampler_destroy);
}

StreamingResampler* get_resampler(PyObject* capsule) {
    return static_cast<StreamingResampler*>(
        PyCapsule_GetPointer(capsule, "rtca_native.resampler"));
}

PyObject* run_process(StreamingResampler* r, const char* data, Py_ssize_t nbytes,
                      bool flush_after) {
    if (nbytes % sizeof(float) != 0) {
        PyErr_SetString(PyExc_ValueError, "buffer must be float32");
        return nullptr;
    }
    std::vector<float> out;
    r->process(reinterpret_cast<const float*>(data), nbytes / sizeof(float), out);
    if (flush_after) {
        std::vector<float> tail;
        r->flush(tail);
        out.insert(out.end(), tail.begin(), tail.end());
    }
    return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out.data()),
                                     out.size() * sizeof(float));
}

PyObject* py_resampler_process(PyObject*, PyObject* args) {
    PyObject* capsule;
    Py_buffer view;
    if (!PyArg_ParseTuple(args, "Oy*", &capsule, &view)) return nullptr;
    auto* r = get_resampler(capsule);
    if (!r) { PyBuffer_Release(&view); return nullptr; }
    PyObject* out = run_process(r, static_cast<const char*>(view.buf), view.len, false);
    PyBuffer_Release(&view);
    return out;
}

PyObject* py_resampler_flush(PyObject*, PyObject* args) {
    PyObject* capsule;
    if (!PyArg_ParseTuple(args, "O", &capsule)) return nullptr;
    auto* r = get_resampler(capsule);
    if (!r) return nullptr;
    std::vector<float> out;
    r->flush(out);
    return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out.data()),
                                     out.size() * sizeof(float));
}

PyObject* py_resample(PyObject*, PyObject* args) {
    Py_buffer view;
    int sr_in, sr_out;
    if (!PyArg_ParseTuple(args, "y*ii", &view, &sr_in, &sr_out)) return nullptr;
    StreamingResampler r(sr_in, sr_out);
    PyObject* out = run_process(&r, static_cast<const char*>(view.buf), view.len, true);
    PyBuffer_Release(&view);
    return out;
}

PyMethodDef methods[] = {
    {"resampler_new", py_resampler_new, METH_VARARGS,
     "resampler_new(sr_in, sr_out) -> capsule"},
    {"resampler_process", py_resampler_process, METH_VARARGS,
     "resampler_process(capsule, float32_bytes) -> float32_bytes"},
    {"resampler_flush", py_resampler_flush, METH_VARARGS,
     "resampler_flush(capsule) -> float32_bytes"},
    {"resample", py_resample, METH_VARARGS,
     "resample(float32_bytes, sr_in, sr_out) -> float32_bytes (one-shot)"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "rtca_native",
                      "C++ host-side audio runtime (streaming resampler)", -1,
                      methods};

}  // namespace

PyMODINIT_FUNC PyInit_rtca_native() { return PyModule_Create(&module); }
