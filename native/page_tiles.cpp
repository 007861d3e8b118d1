// Native single-pass page-upload analysis.
//
// C++ counterpart of the host half of the adaptive sparse page upload
// (oar_ocr_tpu/runtime/page_upload.py — grayscale collapse + 32x32
// constant-tile sparsity for degraded h2d links). The NumPy expression
// of the analysis costs several full passes over the page batch
// (stack_padded copy, full-channel gray compare, reshape + per-tile
// min/max, fancy-indexed tile gather — ~140 ms per 30 MB chunk, and the
// RGB tile gather is pathological); these three entry points do the same
// work in one read of each source page at memory bandwidth, bit-exactly:
//
//   analyze_pages(pages, heights, widths, target_h, target_w, tile)
//     -> (gray: int, base: bytes B*nth*ntw*3 tile minima,
//         occ: bytes B*nth*ntw 0/1)
//   gather_tiles(pages, heights, widths, target_h, target_w, tile,
//                idx_bytes int32[N], gray) -> bytes N*tile*tile*C
//   stack_pages(pages, heights, widths, target_h, target_w, gray)
//     -> bytes B*target_h*target_w*C
//
// Padding semantics match stack_padded: pixels outside a page are 0, so
// a tile crossing the page edge folds 0 into its min (max is unaffected,
// uint8 >= 0) and a fully-outside tile is constant 0.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(__SSE2__)
#include <emmintrin.h>
#define OAR_SSE2 1
#endif

namespace {

struct PageView {
  Py_buffer buf{};
  int h = 0, w = 0;
  const uint8_t* data() const { return (const uint8_t*)buf.buf; }
};

struct Pages {
  std::vector<PageView> v;
  bool ok = false;
  ~Pages() {
    for (auto& p : v)
      if (p.buf.obj) PyBuffer_Release(&p.buf);
  }
};

// Acquire C-contiguous uint8 HWC buffers for every page. heights/widths
// are parallel int sequences; each buffer must hold h*w*3 bytes.
static void get_pages(PyObject* pages, PyObject* hs, PyObject* ws,
                      Pages& out) {
  PyObject* seq = PySequence_Fast(pages, "pages must be a sequence");
  if (!seq) return;
  PyObject* hseq = PySequence_Fast(hs, "heights must be a sequence");
  PyObject* wseq = PySequence_Fast(ws, "widths must be a sequence");
  if (!hseq || !wseq) {
    Py_DECREF(seq);
    Py_XDECREF(hseq);
    Py_XDECREF(wseq);
    return;
  }
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  if (PySequence_Fast_GET_SIZE(hseq) != n ||
      PySequence_Fast_GET_SIZE(wseq) != n) {
    PyErr_SetString(PyExc_ValueError, "pages/heights/widths length mismatch");
  } else {
    out.v.resize(n);
    out.ok = true;
    for (Py_ssize_t i = 0; i < n; ++i) {
      PageView& p = out.v[i];
      p.h = (int)PyLong_AsLong(PySequence_Fast_GET_ITEM(hseq, i));
      p.w = (int)PyLong_AsLong(PySequence_Fast_GET_ITEM(wseq, i));
      if (PyErr_Occurred() ||
          PyObject_GetBuffer(PySequence_Fast_GET_ITEM(seq, i), &p.buf,
                             PyBUF_C_CONTIGUOUS) != 0 ||
          p.buf.len < (Py_ssize_t)p.h * p.w * 3) {
        if (!PyErr_Occurred())
          PyErr_SetString(PyExc_ValueError, "page buffer too small");
        out.ok = false;
        break;
      }
    }
  }
  Py_DECREF(seq);
  Py_DECREF(hseq);
  Py_DECREF(wseq);
}

static PyObject* analyze_pages(PyObject*, PyObject* args) {
  PyObject *pages, *hs, *ws;
  int target_h, target_w, tile;
  if (!PyArg_ParseTuple(args, "OOOiii", &pages, &hs, &ws, &target_h,
                        &target_w, &tile))
    return nullptr;
  Pages pv;
  get_pages(pages, hs, ws, pv);
  if (!pv.ok) return nullptr;
  const int nth = target_h / tile, ntw = target_w / tile;
  const Py_ssize_t b = (Py_ssize_t)pv.v.size();
  PyObject* base_b = PyBytes_FromStringAndSize(nullptr, b * nth * ntw * 3);
  PyObject* occ_b = PyBytes_FromStringAndSize(nullptr, b * nth * ntw);
  if (!base_b || !occ_b) {
    Py_XDECREF(base_b);
    Py_XDECREF(occ_b);
    return nullptr;
  }
  uint8_t* base = (uint8_t*)PyBytes_AS_STRING(base_b);
  uint8_t* occ = (uint8_t*)PyBytes_AS_STRING(occ_b);
  int gray = 1;

  // period-48 phase mask (48 = lcm(3-byte pixel, 16-byte lane)):
  // 0xFF where byte i and i+1 belong to the same pixel (i % 3 != 2)
  static uint8_t phase_mask[48];
  for (int i = 0; i < 48; ++i) phase_mask[i] = (i % 3 != 2) ? 0xFF : 0;

  Py_BEGIN_ALLOW_THREADS;
  for (Py_ssize_t pi = 0; pi < b; ++pi) {
    const PageView& p = pv.v[pi];
    const uint8_t* src = p.data();
    uint8_t* base_p = base + pi * nth * ntw * 3;
    uint8_t* occ_p = occ + pi * nth * ntw;
    uint8_t graydiff = 0;

    // --- gray check: one pass over the page rows (per-page property,
    // decoupled from the tile grid so both loops stay SIMD-clean) ---
    {
      const int nb = 3 * p.w;
#ifdef OAR_SSE2
      const __m128i m0 = _mm_loadu_si128((const __m128i*)phase_mask);
      const __m128i m1 = _mm_loadu_si128((const __m128i*)(phase_mask + 16));
      const __m128i m2 = _mm_loadu_si128((const __m128i*)(phase_mask + 32));
      __m128i vdiff = _mm_setzero_si128();
#endif
      for (int y = 0; y < p.h && !graydiff; ++y) {
        const uint8_t* row = src + (size_t)y * nb;
        int k = 0;
#ifdef OAR_SSE2
        for (; k + 49 <= nb; k += 48) {
          const __m128i a0 = _mm_loadu_si128((const __m128i*)(row + k));
          const __m128i b0 = _mm_loadu_si128((const __m128i*)(row + k + 1));
          const __m128i a1 = _mm_loadu_si128((const __m128i*)(row + k + 16));
          const __m128i b1 = _mm_loadu_si128((const __m128i*)(row + k + 17));
          const __m128i a2 = _mm_loadu_si128((const __m128i*)(row + k + 32));
          const __m128i b2 = _mm_loadu_si128((const __m128i*)(row + k + 33));
          vdiff = _mm_or_si128(
              vdiff, _mm_or_si128(
                         _mm_and_si128(_mm_xor_si128(a0, b0), m0),
                         _mm_or_si128(
                             _mm_and_si128(_mm_xor_si128(a1, b1), m1),
                             _mm_and_si128(_mm_xor_si128(a2, b2), m2))));
        }
        // early-out per 4 rows: a colored page bails fast
        if ((y & 3) == 3) {
          uint8_t tmp[16];
          _mm_storeu_si128((__m128i*)tmp, vdiff);
          for (int t = 0; t < 16; ++t) graydiff |= tmp[t];
        }
#endif
        for (; k + 1 < nb; ++k)
          if (k % 3 != 2) graydiff |= (uint8_t)(row[k] ^ row[k + 1]);
      }
#ifdef OAR_SSE2
      uint8_t tmp[16];
      _mm_storeu_si128((__m128i*)tmp, vdiff);
      for (int t = 0; t < 16; ++t) graydiff |= tmp[t];
#endif
    }

    // --- per-tile min/max ---
    const int halves = (3 * tile) / 48;  // 2 for the 32-px tile
    for (int ti = 0; ti < nth; ++ti) {
      const int y0 = ti * tile;
      const int ylim = std::min(tile, p.h - y0);  // rows inside the page
      for (int tj = 0; tj < ntw; ++tj) {
        const int x0 = tj * tile;
        const int xlim = std::min(tile, p.w - x0);
        uint8_t mn[3] = {255, 255, 255}, mx[3] = {0, 0, 0};
        if (ylim <= 0 || xlim <= 0) {
          mn[0] = mn[1] = mn[2] = 0;  // fully padding: constant 0
        } else {
#ifdef OAR_SSE2
          if (ylim == tile && xlim == tile && halves * 48 == 3 * tile) {
            // full interior tile: accumulators live in registers across
            // the whole 32-row loop; channels fold out at the end
            // (period 48 ≡ 0 mod 3)
            __m128i vmn0 = _mm_set1_epi8((char)0xFF), vmn1 = vmn0,
                    vmn2 = vmn0;
            __m128i vmx0 = _mm_setzero_si128(), vmx1 = vmx0, vmx2 = vmx0;
            for (int y = 0; y < tile; ++y) {
              const uint8_t* r = src + ((size_t)(y0 + y) * p.w + x0) * 3;
              for (int hf = 0; hf < halves; ++hf, r += 48) {
                const __m128i a0 = _mm_loadu_si128((const __m128i*)r);
                const __m128i a1 =
                    _mm_loadu_si128((const __m128i*)(r + 16));
                const __m128i a2 =
                    _mm_loadu_si128((const __m128i*)(r + 32));
                vmn0 = _mm_min_epu8(vmn0, a0);
                vmx0 = _mm_max_epu8(vmx0, a0);
                vmn1 = _mm_min_epu8(vmn1, a1);
                vmx1 = _mm_max_epu8(vmx1, a1);
                vmn2 = _mm_min_epu8(vmn2, a2);
                vmx2 = _mm_max_epu8(vmx2, a2);
              }
            }
            uint8_t tmn[48], tm3[48];
            _mm_storeu_si128((__m128i*)tmn, vmn0);
            _mm_storeu_si128((__m128i*)(tmn + 16), vmn1);
            _mm_storeu_si128((__m128i*)(tmn + 32), vmn2);
            _mm_storeu_si128((__m128i*)tm3, vmx0);
            _mm_storeu_si128((__m128i*)(tm3 + 16), vmx1);
            _mm_storeu_si128((__m128i*)(tm3 + 32), vmx2);
            for (int t = 0; t < 48; ++t) {
              const int ch = t % 3;
              mn[ch] = std::min(mn[ch], tmn[t]);
              mx[ch] = std::max(mx[ch], tm3[t]);
            }
          } else
#endif
          {
            for (int y = 0; y < ylim; ++y) {
              const uint8_t* row = src + ((size_t)(y0 + y) * p.w + x0) * 3;
              for (int x = 0; x < xlim; ++x) {
                for (int ch = 0; ch < 3; ++ch) {
                  const uint8_t v = row[3 * x + ch];
                  mn[ch] = std::min(mn[ch], v);
                  mx[ch] = std::max(mx[ch], v);
                }
              }
            }
            if (ylim < tile || xlim < tile) {  // partial padding folds 0
              mn[0] = mn[1] = mn[2] = 0;
              // max(pixels, 0) == max(pixels) for uint8 — mx unchanged
            }
          }
        }
        uint8_t* bout = base_p + (ti * ntw + tj) * 3;
        bout[0] = mn[0];
        bout[1] = mn[1];
        bout[2] = mn[2];
        occ_p[ti * ntw + tj] =
            (uint8_t)((mn[0] != mx[0]) | (mn[1] != mx[1]) | (mn[2] != mx[2]));
      }
    }
    if (graydiff) gray = 0;
  }
  Py_END_ALLOW_THREADS;

  PyObject* out = Py_BuildValue("iNN", gray, base_b, occ_b);
  return out;
}

static PyObject* gather_tiles(PyObject*, PyObject* args) {
  PyObject *pages, *hs, *ws;
  Py_buffer idx_buf;
  int target_h, target_w, tile, gray;
  if (!PyArg_ParseTuple(args, "OOOiiiy*i", &pages, &hs, &ws, &target_h,
                        &target_w, &tile, &idx_buf, &gray))
    return nullptr;
  Pages pv;
  get_pages(pages, hs, ws, pv);
  if (!pv.ok) {
    PyBuffer_Release(&idx_buf);
    return nullptr;
  }
  const int nth = target_h / tile, ntw = target_w / tile;
  const int32_t* idx = (const int32_t*)idx_buf.buf;
  const Py_ssize_t n = idx_buf.len / (Py_ssize_t)sizeof(int32_t);
  const int c = gray ? 1 : 3;
  PyObject* out_b =
      PyBytes_FromStringAndSize(nullptr, n * (Py_ssize_t)tile * tile * c);
  if (!out_b) {
    PyBuffer_Release(&idx_buf);
    return nullptr;
  }
  uint8_t* out = (uint8_t*)PyBytes_AS_STRING(out_b);
  bool bad = false;

  Py_BEGIN_ALLOW_THREADS;
  for (Py_ssize_t i = 0; i < n; ++i) {
    uint8_t* dst = out + i * (size_t)tile * tile * c;
    const int32_t flat = idx[i];
    const int pi = flat / (nth * ntw);
    if (pi < 0 || pi >= (int)pv.v.size()) {
      bad = true;
      break;
    }
    const int ti = (flat / ntw) % nth, tj = flat % ntw;
    const PageView& p = pv.v[pi];
    const uint8_t* src = p.data();
    const int y0 = ti * tile, x0 = tj * tile;
    const int ylim = std::max(0, std::min(tile, p.h - y0));
    const int xlim = std::max(0, std::min(tile, p.w - x0));
    std::memset(dst, 0, (size_t)tile * tile * c);
    for (int y = 0; y < ylim; ++y) {
      const uint8_t* row = src + ((size_t)(y0 + y) * p.w + x0) * 3;
      uint8_t* drow = dst + (size_t)y * tile * c;
      if (c == 3) {
        std::memcpy(drow, row, (size_t)xlim * 3);
      } else {
        for (int x = 0; x < xlim; ++x) drow[x] = row[3 * x];
      }
    }
  }
  Py_END_ALLOW_THREADS;

  PyBuffer_Release(&idx_buf);
  if (bad) {
    Py_DECREF(out_b);
    PyErr_SetString(PyExc_ValueError, "tile index out of range");
    return nullptr;
  }
  return out_b;
}

static PyObject* stack_pages(PyObject*, PyObject* args) {
  PyObject *pages, *hs, *ws;
  int target_h, target_w, gray;
  if (!PyArg_ParseTuple(args, "OOOiii", &pages, &hs, &ws, &target_h,
                        &target_w, &gray))
    return nullptr;
  Pages pv;
  get_pages(pages, hs, ws, pv);
  if (!pv.ok) return nullptr;
  const int c = gray ? 1 : 3;
  const Py_ssize_t b = (Py_ssize_t)pv.v.size();
  PyObject* out_b = PyBytes_FromStringAndSize(
      nullptr, b * (Py_ssize_t)target_h * target_w * c);
  if (!out_b) return nullptr;
  uint8_t* out = (uint8_t*)PyBytes_AS_STRING(out_b);

  Py_BEGIN_ALLOW_THREADS;
  std::memset(out, 0, (size_t)b * target_h * target_w * c);
  for (Py_ssize_t pi = 0; pi < b; ++pi) {
    const PageView& p = pv.v[pi];
    const uint8_t* src = p.data();
    uint8_t* dst = out + pi * (size_t)target_h * target_w * c;
    const int hlim = std::min(p.h, target_h);
    const int wlim = std::min(p.w, target_w);
    for (int y = 0; y < hlim; ++y) {
      const uint8_t* row = src + (size_t)y * p.w * 3;
      uint8_t* drow = dst + (size_t)y * target_w * c;
      if (c == 3) {
        std::memcpy(drow, row, (size_t)wlim * 3);
      } else {
        for (int x = 0; x < wlim; ++x) drow[x] = row[3 * x];
      }
    }
  }
  Py_END_ALLOW_THREADS;

  return out_b;
}

}  // namespace

// registered from db_candidates.cpp's module table
extern "C" {
PyObject* oar_analyze_pages(PyObject* self, PyObject* args) {
  return analyze_pages(self, args);
}
PyObject* oar_gather_tiles(PyObject* self, PyObject* args) {
  return gather_tiles(self, args);
}
PyObject* oar_stack_pages(PyObject* self, PyObject* args) {
  return stack_pages(self, args);
}
}
