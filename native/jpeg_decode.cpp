// Native JPEG decoder (data-loader fast path).
//
// The training input pipeline decodes base64 JPEG rows from TSV shards
// (gligen_tpu/data/tsv.py decode_base64_image; the reference decodes the
// same payloads through PIL inside DataLoader worker processes,
// dataset/tsv_dataset.py:22-40).  On TPU hosts the pipeline shares a few
// CPU cores with the runtime, and fork pools pay a copy-on-write image of
// the whole parent (measured r3: workers=4 processes LOSE to 1 thread on
// a 1-core host).  This decoder:
//   * wraps system libjpeg with a setjmp error trap (corrupt rows return
//     an error code instead of exit()),
//   * converts grayscale/CMYK to RGB in-place so callers always get HxWx3,
//   * offers a batch entry point that decodes N images on T std::threads —
//     ctypes calls release the GIL, so Python threads scale without
//     processes.
//
// C ABI for ctypes (gligen_tpu/data/jpeg.py).

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrTrap {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void on_error(j_common_ptr cinfo) {
  ErrTrap* trap = reinterpret_cast<ErrTrap*>(cinfo->err);
  longjmp(trap->jump, 1);
}

void silence(j_common_ptr, int) {}
void silence_msg(j_common_ptr) {}

// Decode header only; returns 0 and fills w/h/channels-after-conversion.
int probe(const uint8_t* buf, int64_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrTrap trap;
  cinfo.err = jpeg_std_error(&trap.mgr);
  trap.mgr.error_exit = on_error;
  trap.mgr.emit_message = silence;
  trap.mgr.output_message = silence_msg;
  if (setjmp(trap.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  *w = (int)cinfo.image_width;
  *h = (int)cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Full decode to RGB8 into out (capacity out_cap bytes). Returns 0 on ok.
int decode_rgb(const uint8_t* buf, int64_t len, uint8_t* out, int64_t out_cap,
               int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrTrap trap;
  cinfo.err = jpeg_std_error(&trap.mgr);
  trap.mgr.error_exit = on_error;
  trap.mgr.emit_message = silence;
  trap.mgr.output_message = silence_msg;
  if (setjmp(trap.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  // PIL/libjpeg default: accurate integer IDCT — keeps outputs identical
  // to the PIL path so datasets don't depend on which decoder ran.
  cinfo.dct_method = JDCT_ISLOW;
  bool expand_gray = false;
  if (cinfo.jpeg_color_space == JCS_GRAYSCALE) {
    // classic libjpeg cannot convert gray->RGB; decode gray, expand below
    cinfo.out_color_space = JCS_GRAYSCALE;
    expand_gray = true;
  } else {
    cinfo.out_color_space = JCS_RGB;
  }
  jpeg_start_decompress(&cinfo);
  const int W = (int)cinfo.output_width;
  const int H = (int)cinfo.output_height;
  const int C = (int)cinfo.output_components;  // 1 (gray) or 3 (rgb)
  if ((int64_t)W * H * 3 > out_cap) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  std::vector<uint8_t> gray_row(expand_gray ? (size_t)W : 0);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* dst = out + (int64_t)cinfo.output_scanline * W * 3;
    if (expand_gray) {
      uint8_t* rowp = gray_row.data();
      jpeg_read_scanlines(&cinfo, &rowp, 1);
      for (int x = 0; x < W; ++x) {
        dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = gray_row[x];
      }
    } else {
      jpeg_read_scanlines(&cinfo, &dst, 1);
    }
  }
  (void)C;
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *w = W;
  *h = H;
  return 0;
}

}  // namespace

extern "C" {

int jpeg_probe_dims(const uint8_t* buf, int64_t len, int* w, int* h) {
  return probe(buf, len, w, h);
}

int jpeg_decode_to_rgb(const uint8_t* buf, int64_t len, uint8_t* out,
                       int64_t out_cap, int* w, int* h) {
  return decode_rgb(buf, len, out, out_cap, w, h);
}

// Batch decode with a thread pool (atomic work stealing).  bufs/lens give
// the N inputs; outs/caps the N output buffers; ws/hs/rcs receive dims and
// per-item return codes.  The ctypes call releases the GIL for the whole
// batch.
void jpeg_decode_batch_rgb(int64_t n, const uint8_t** bufs,
                           const int64_t* lens, uint8_t** outs,
                           const int64_t* caps, int* ws, int* hs, int* rcs,
                           int threads) {
  if (threads < 1) threads = 1;
  if (threads > (int)n) threads = (int)n;
  std::atomic<int64_t> next(0);
  auto work = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      rcs[i] = decode_rgb(bufs[i], lens[i], outs[i], caps[i], &ws[i], &hs[i]);
    }
  };
  if (threads == 1) {
    work();
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(work);
  for (auto& th : pool) th.join();
}

}  // extern "C"
