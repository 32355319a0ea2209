// Native batch JPEG frame decoder for the episodic data pipeline.
//
// The reference decodes frames with PIL inside forked DataLoader workers
// (reference: video_reader.py:227-273, run/main_run.py:71). This library
// decodes a whole episode's frame list with a std::thread pool directly into
// one preallocated uint8 [N, H, W, 3] buffer — no Python in the inner loop,
// no per-image allocations, and the output is already the layout the device
// transform consumes.
//
// C ABI only (loaded via ctypes — no pybind11 dependency).

#include <cstdio>  // must precede jpeglib.h (it needs FILE declared)

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decodes one JPEG file into out[H*W*3]; returns 0 on success, negative on
// error (-1 open, -2 decode, -3 unexpected geometry).
int decode_one(const char* path, unsigned char* out, int height, int width) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  if (static_cast<int>(cinfo.output_height) != height ||
      static_cast<int>(cinfo.output_width) != width ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -3;
  }

  const int stride = width * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out + cinfo.output_scanline * stride;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

}  // namespace

extern "C" {

// Decode n JPEG files (all height x width RGB) into out [n, H, W, 3].
// Returns 0 on success; otherwise (1 + index) of the first failing file.
int decode_jpeg_frames(const char** paths, int n, unsigned char* out,
                       int height, int width, int n_threads) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;

  const long frame_bytes = static_cast<long>(height) * width * 3;
  std::atomic<int> next(0);
  std::atomic<int> failed(0);  // 1 + index of first failure

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) break;
      int rc = decode_one(paths[i], out + i * frame_bytes, height, width);
      if (rc != 0) {
        int expected = 0;
        failed.compare_exchange_strong(expected, 1 + i);
      }
    }
  };

  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failed.load();
}

// Probe: returns the library ABI version.
int frame_decoder_version() { return 1; }

}  // extern "C"
