/* audio_calm_native: C hot paths for the host-side data pipeline.
 *
 * The TPU does the math; the host (often a single core per chip worker)
 * must keep it fed. These are the measured host bottlenecks:
 *   - decode_wav: RIFF/WAVE parse + PCM -> float32 mono mix + peak
 *     normalize in one pass (replaces the numpy frombuffer/reshape/mean
 *     chain in data/preprocess.py)
 *   - edit_distance_i32: Levenshtein over int32 token buffers for
 *     corpus-scale WER/CER (replaces the O(N*M) Python loop in
 *     eval/metrics.py)
 *
 * Pure-Python fallbacks remain in audio_calm_tpu; this module is optional.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <math.h>
#include <stdint.h>
#include <string.h>

/* --------------------------------------------------------------------- */
static uint32_t rd_u32(const uint8_t *p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t *p) {
    return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

/* decode_wav(data: bytes, peak: float = 0.95)
 *   -> (mono_f32: bytes, sample_rate: int, n_samples: int) */
static PyObject *decode_wav(PyObject *self, PyObject *args) {
    Py_buffer buf;
    double peak_target = 0.95;
    if (!PyArg_ParseTuple(args, "y*|d", &buf, &peak_target)) return NULL;
    const uint8_t *p = (const uint8_t *)buf.buf;
    Py_ssize_t n = buf.len;

    if (n < 44 || memcmp(p, "RIFF", 4) != 0 || memcmp(p + 8, "WAVE", 4) != 0) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "not a RIFF/WAVE file");
        return NULL;
    }

    uint16_t fmt = 0, channels = 0, bits = 0;
    uint32_t sr = 0;
    const uint8_t *data = NULL;
    uint32_t data_len = 0;

    Py_ssize_t off = 12;
    while (off + 8 <= n) {
        const uint8_t *chunk = p + off;
        uint32_t clen = rd_u32(chunk + 4);
        if (memcmp(chunk, "fmt ", 4) == 0 && clen >= 16 && off + 8 + 16 <= n) {
            fmt = rd_u16(chunk + 8);
            channels = rd_u16(chunk + 10);
            sr = rd_u32(chunk + 12);
            bits = rd_u16(chunk + 22);
        } else if (memcmp(chunk, "data", 4) == 0) {
            data = chunk + 8;
            data_len = clen;
            if ((Py_ssize_t)(off + 8 + (Py_ssize_t)clen) > n)
                data_len = (uint32_t)(n - off - 8);
            break;
        }
        off += 8 + clen + (clen & 1);
    }
    if (!data || channels == 0 || sr == 0 ||
        (fmt != 1 && fmt != 3) /* PCM or IEEE float */) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "unsupported or truncated WAV");
        return NULL;
    }

    uint32_t bytes_per = bits / 8;
    if (bytes_per == 0 || (fmt == 1 && bits != 8 && bits != 16 && bits != 32) ||
        (fmt == 3 && bits != 32)) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "unsupported WAV sample format");
        return NULL;
    }
    uint32_t frames = data_len / (bytes_per * channels);

    PyObject *out = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)frames * 4);
    if (!out) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    float *dst = (float *)PyBytes_AS_STRING(out);

    float peak = 0.0f;
    const float inv_ch = 1.0f / (float)channels;
    for (uint32_t i = 0; i < frames; i++) {
        float acc = 0.0f;
        const uint8_t *fp = data + (size_t)i * bytes_per * channels;
        for (uint16_t c = 0; c < channels; c++) {
            const uint8_t *sp = fp + (size_t)c * bytes_per;
            float v;
            if (fmt == 3) { /* float32 */
                uint32_t u = rd_u32(sp);
                memcpy(&v, &u, 4);
            } else if (bits == 16) {
                int16_t s = (int16_t)rd_u16(sp);
                v = (float)s / 32768.0f;
            } else if (bits == 32) {
                int32_t s = (int32_t)rd_u32(sp);
                v = (float)s / 2147483648.0f;
            } else { /* u8 */
                v = ((float)sp[0] - 128.0f) / 128.0f;
            }
            acc += v;
        }
        acc *= inv_ch;
        dst[i] = acc;
        float a = fabsf(acc);
        if (a > peak) peak = a;
    }
    if (peak > 0.0f && peak_target > 0.0) { /* <= 0 disables normalization */
        const float scale = (float)peak_target / (peak + 1e-8f);
        for (uint32_t i = 0; i < frames; i++) dst[i] *= scale;
    }
    PyBuffer_Release(&buf);
    return Py_BuildValue("(NIk)", out, sr, (unsigned long)frames);
}

/* edit_distance_i32(a: buffer of int32, b: buffer of int32) -> int */
static PyObject *edit_distance_i32(PyObject *self, PyObject *args) {
    Py_buffer a, b;
    if (!PyArg_ParseTuple(args, "y*y*", &a, &b)) return NULL;
    Py_ssize_t n = a.len / 4, m = b.len / 4;
    const int32_t *A = (const int32_t *)a.buf;
    const int32_t *B = (const int32_t *)b.buf;

    if (n == 0 || m == 0) {
        Py_ssize_t r = n ? n : m;
        PyBuffer_Release(&a);
        PyBuffer_Release(&b);
        return PyLong_FromSsize_t(r);
    }
    int32_t *prev = (int32_t *)PyMem_Malloc((m + 1) * sizeof(int32_t));
    if (!prev) {
        PyBuffer_Release(&a);
        PyBuffer_Release(&b);
        return PyErr_NoMemory();
    }
    for (Py_ssize_t j = 0; j <= m; j++) prev[j] = (int32_t)j;
    for (Py_ssize_t i = 1; i <= n; i++) {
        int32_t diag = prev[0];
        prev[0] = (int32_t)i;
        const int32_t ai = A[i - 1];
        for (Py_ssize_t j = 1; j <= m; j++) {
            int32_t tmp = prev[j];
            int32_t cost = (ai == B[j - 1]) ? 0 : 1;
            int32_t best = diag + cost;
            if (prev[j] + 1 < best) best = prev[j] + 1;
            if (prev[j - 1] + 1 < best) best = prev[j - 1] + 1;
            prev[j] = best;
            diag = tmp;
        }
    }
    int32_t res = prev[m];
    PyMem_Free(prev);
    PyBuffer_Release(&a);
    PyBuffer_Release(&b);
    return PyLong_FromLong(res);
}

static PyMethodDef Methods[] = {
    {"decode_wav", decode_wav, METH_VARARGS,
     "decode_wav(data, peak=0.95) -> (float32 bytes, sample_rate, n)"},
    {"edit_distance_i32", edit_distance_i32, METH_VARARGS,
     "Levenshtein distance between two int32 buffers"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "audio_calm_native",
    "C hot paths for the audio_calm_tpu host data pipeline", -1, Methods,
};

PyMODINIT_FUNC PyInit_audio_calm_native(void) {
    return PyModule_Create(&moduledef);
}
