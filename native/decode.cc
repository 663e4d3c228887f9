// Native JPEG decode: bytes -> RGB8, via the system libjpeg(-turbo).
//
// The C++ counterpart of the reference's `image` crate decode stage
// (reference: src/vision.rs:102-135 decodes with the Rust image crate
// before its native resize). Used by clip_embedder_tpu/utils/images.py
// as the fast path for JPEG files/bytes — ctypes releases the GIL around
// the call, so the EmbedPipeline's decode thread pool scales across cores
// without Python in the inner loop. Falls back to Pillow for non-JPEG
// inputs or when the library isn't built.
//
// Two-phase C ABI (caller owns all memory — nothing mallocs across the
// boundary): call with out=nullptr to get dimensions from the header,
// then with a [h*w*3] buffer to decode.
//
// Build: make -C native   (part of libclippre.so, links -ljpeg)

#include <csetjmp>
#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void err_exit(j_common_ptr cinfo) {
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

void silence(j_common_ptr, int) {}
void silence_msg(j_common_ptr) {}

}  // namespace

extern "C" {

// Returns 0 on success, nonzero on decode error. With out == nullptr only
// the header is parsed and *w/*h are set; with out != nullptr the full
// image is decoded as packed RGB8 rows into out (size *h * *w * 3 from the
// header phase — re-verified against the decode-phase dimensions).
int clip_decode_jpeg(const unsigned char* data, unsigned long len,
                     unsigned char* out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  jerr.pub.emit_message = silence;
  jerr.pub.output_message = silence_msg;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_calc_output_dimensions(&cinfo);
  if (out == nullptr) {
    *w = static_cast<int>(cinfo.output_width);
    *h = static_cast<int>(cinfo.output_height);
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (*w != static_cast<int>(cinfo.output_width) ||
      *h != static_cast<int>(cinfo.output_height)) {
    jpeg_destroy_decompress(&cinfo);
    return 3;  // caller's buffer was sized for different dimensions
  }
  jpeg_start_decompress(&cinfo);
  const size_t stride = static_cast<size_t>(cinfo.output_width) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
