/* Tiny libjpeg wrapper used ONLY by tests as a conformance oracle for
 * the pure-Python JPEG decoder (simple_tsdb_spark/pipeline/jpeg.py).
 * Compiled on demand by tests/jpeg_oracle.py when gcc + libjpeg are
 * present; every test using it skips cleanly otherwise.
 *
 * API (all return 0 on success):
 *   shim_encode(pixels, w, h, ch, quality, progressive, arith,
 *               restart_rows, out_buf, out_len)  -- RGB/gray -> JPEG
 *   shim_decode(data, len, out_pixels, out_w, out_h, out_ch)
 *   shim_free(ptr)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

struct err_jmp {
  struct jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void on_error(j_common_ptr cinfo) {
  struct err_jmp *e = (struct err_jmp *)cinfo->err;
  longjmp(e->jb, 1);
}

int shim_encode(const unsigned char *pixels, int w, int h, int ch,
                int quality, int progressive, int arith, int restart_rows,
                unsigned char **out_buf, unsigned long *out_len) {
  struct jpeg_compress_struct cinfo;
  struct err_jmp jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = on_error;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_compress(&cinfo);
    return 1;
  }
  jpeg_create_compress(&cinfo);
  *out_buf = NULL;
  *out_len = 0;
  jpeg_mem_dest(&cinfo, out_buf, out_len);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = ch;
  cinfo.in_color_space = ch == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  if (arith)
    cinfo.arith_code = TRUE;
  if (progressive)
    jpeg_simple_progression(&cinfo);
  if (restart_rows)
    cinfo.restart_in_rows = restart_rows;
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = (JSAMPROW)(pixels + (size_t)cinfo.next_scanline * w * ch);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  return 0;
}

int shim_decode_opts(const unsigned char *data, unsigned long len, int fancy,
                     unsigned char **out_pixels, int *out_w, int *out_h,
                     int *out_ch);

int shim_decode(const unsigned char *data, unsigned long len,
                unsigned char **out_pixels, int *out_w, int *out_h,
                int *out_ch) {
  return shim_decode_opts(data, len, 1, out_pixels, out_w, out_h, out_ch);
}

int shim_decode_opts(const unsigned char *data, unsigned long len, int fancy,
                     unsigned char **out_pixels, int *out_w, int *out_h,
                     int *out_ch) {
  struct jpeg_decompress_struct cinfo;
  struct err_jmp jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = on_error;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  /* exact IDCT: islow is libjpeg's reference path */
  cinfo.dct_method = JDCT_ISLOW;
  cinfo.do_fancy_upsampling = fancy ? TRUE : FALSE;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height,
      ch = cinfo.output_components;
  unsigned char *buf = malloc((size_t)w * h * ch);
  if (!buf) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = buf + (size_t)cinfo.output_scanline * w * ch;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_pixels = buf;
  *out_w = w;
  *out_h = h;
  *out_ch = ch;
  return 0;
}

void shim_free(void *p) { free(p); }
