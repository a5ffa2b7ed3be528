// libi2vio — native decode + IO runtime for i2v_tpu.
//
// Role: the decord/PIL-SIMD equivalent of the reference's data path
// (reference: datasets.py:188-244 decord mp4 decode with fixed-size scaling;
// dataset_ucf101.py:13-34 JPEG frame loading). FFmpeg (libavformat/avcodec/
// swscale) handles video; libjpeg handles frame JPEGs. Exposed as a C ABI
// consumed via ctypes (i2v_tpu/data/native.py).
//
// Design notes:
//  - decode_video scales every frame to a fixed (width × height) RGB canvas
//    at decode time (SWS_BILINEAR), matching the reference's decord
//    VideoReader(width=340, height=256) usage — downstream transforms then
//    see a static shape, which keeps the device-side pipeline shape-stable.
//  - All buffers are malloc'd here and released by i2v_free — no hidden
//    ownership across the ctypes boundary.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <csetjmp>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
#include <jpeglib.h>
}

extern "C" {

__attribute__((constructor)) static void i2v_init() {
  av_log_set_level(AV_LOG_ERROR);  // silence per-frame swscale deprecation spam
}

void i2v_free(uint8_t* ptr) { free(ptr); }

// Decode an entire video file to (n_frames, height, width, 3) uint8 RGB.
// Returns 0 on success; fills *out (malloc'd) and *n_frames.
int i2v_decode_video(const char* path, int width, int height,
                     uint8_t** out, int* n_frames) {
  *out = nullptr;
  *n_frames = 0;

  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  const AVCodec* codec = nullptr;
  int vstream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (vstream < 0 || !codec) {
    avformat_close_input(&fmt);
    return -3;
  }
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, fmt->streams[vstream]->codecpar);
  ctx->thread_count = 1;  // one decoder per worker thread; threads live above
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -4;
  }

  const size_t frame_bytes = (size_t)width * height * 3;
  size_t cap = 64;
  uint8_t* buf = (uint8_t*)malloc(cap * frame_bytes);
  size_t count = 0;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  SwsContext* sws = nullptr;
  int sws_w = 0, sws_h = 0, sws_fmt = -1;
  // every alloc/convert failure routes through `err` so the thread-pool
  // batch decoder's per-item isolation (rcs[i]) actually sees it instead
  // of the process crashing on a NULL dereference
  int err = buf ? 0 : -6;

  auto emit = [&](AVFrame* f) {
    if (err) return;
    if (!sws || f->width != sws_w || f->height != sws_h ||
        f->format != sws_fmt) {
      // a mid-stream resolution/format change (spliced segments, SPS
      // switch) invalidates the cached context — rebuild rather than scale
      // with stale geometry (out-of-bounds reads when the frame shrank)
      if (sws) sws_freeContext(sws);
      // BITEXACT: swscale's SIMD tail paths vary with buffer alignment on
      // non-multiple-of-16 widths (e.g. the reference's 340), making output
      // depend on heap state; force the bit-exact path so decode is
      // deterministic across call patterns and thread pools.
      sws = sws_getContext(f->width, f->height, (AVPixelFormat)f->format,
                           width, height, AV_PIX_FMT_RGB24,
                           SWS_BILINEAR | SWS_BITEXACT | SWS_ACCURATE_RND,
                           nullptr, nullptr, nullptr);
      if (!sws) {  // unsupported/invalid source format
        err = -7;
        return;
      }
      sws_w = f->width;
      sws_h = f->height;
      sws_fmt = f->format;
    }
    if (count == cap) {
      uint8_t* nbuf = (uint8_t*)realloc(buf, cap * 2 * frame_bytes);
      if (!nbuf) {  // keep the old buf valid for the cleanup free()
        err = -6;
        return;
      }
      buf = nbuf;
      cap *= 2;
    }
    uint8_t* dst[1] = {buf + count * frame_bytes};
    int dst_stride[1] = {width * 3};
    sws_scale(sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
    ++count;
  };

  int rret;
  while ((rret = av_read_frame(fmt, pkt)) >= 0) {
    if (pkt->stream_index == vstream) {
      if (avcodec_send_packet(ctx, pkt) == 0) {
        while (avcodec_receive_frame(ctx, frame) == 0) emit(frame);
      }
    }
    av_packet_unref(pkt);
  }
  // a read error that is NOT end-of-file means the container is truncated
  // or corrupt mid-stream — fail the item (the skip-and-resample layer keys
  // on rc != 0) instead of returning a silently short frame set
  if (rret != AVERROR_EOF && err == 0) err = -8;
  // drain
  avcodec_send_packet(ctx, nullptr);
  while (avcodec_receive_frame(ctx, frame) == 0) emit(frame);

  if (sws) sws_freeContext(sws);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);

  if (err != 0 || count == 0) {
    free(buf);
    return err != 0 ? err : -5;
  }
  *out = buf;
  *n_frames = (int)count;
  return 0;
}

// libjpeg's default error_exit calls exit(); route fatal errors through
// setjmp/longjmp (the canonical libjpeg recovery pattern) so a corrupt frame
// returns an error code instead of killing the process — required for the
// batch decoder's per-item failure isolation.
struct I2vJpegErr {
  jpeg_error_mgr mgr;
  jmp_buf env;
};

static void i2v_jpeg_error_exit(j_common_ptr cinfo) {
  longjmp(((I2vJpegErr*)cinfo->err)->env, 1);
}

// Decode a JPEG file to (height, width, 3) uint8 RGB.
int i2v_decode_jpeg(const char* path, uint8_t** out, int* w, int* h) {
  *out = nullptr;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  I2vJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = i2v_jpeg_error_exit;
  // volatile: written between setjmp and longjmp, read in the handler
  uint8_t* volatile buf = nullptr;
  if (setjmp(jerr.env)) {  // any fatal libjpeg error lands here
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    free(buf);
    return -3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = (int)cinfo.output_width;
  *h = (int)cinfo.output_height;
  size_t stride = (size_t)(*w) * 3;
  buf = (uint8_t*)malloc((size_t)(*h) * stride);
  if (!buf) {  // fail the item, don't crash the pool on a NULL row pointer
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  *out = buf;
  return 0;
}

// ---- batch decode: native thread-pool executor ----
//
// The reference gets decode parallelism from 9 DataLoader fork-workers
// (datasets.py:272-274). Here the fan-out lives in the runtime: one call
// decodes a whole batch with a std::thread pool (atomic work-stealing index),
// entirely GIL-free. Per-item outputs/return codes land in caller arrays so
// one bad video never poisons the batch (skip-and-resample stays upstream).

// Decode n videos in parallel. outs[i] ← malloc'd (n_frames[i],h,w,3) RGB or
// NULL; rcs[i] ← the i2v_decode_video return code. threads<=0 → #cores
// (capped at n). Returns the number of successfully decoded videos.
int i2v_decode_videos(const char** paths, int n, int width, int height,
                      int threads, uint8_t** outs, int* n_frames, int* rcs) {
  if (n <= 0) return 0;
  int workers = threads > 0 ? threads
                            : (int)std::thread::hardware_concurrency();
  workers = std::max(1, std::min(workers, n));
  std::atomic<int> next(0), ok(0);
  auto run = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      outs[i] = nullptr;
      n_frames[i] = 0;
      rcs[i] = i2v_decode_video(paths[i], width, height, &outs[i],
                                &n_frames[i]);
      if (rcs[i] == 0) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < workers; ++t) pool.emplace_back(run);
  run();
  for (auto& t : pool) t.join();
  return ok.load();
}

// Decode n JPEGs in parallel (UCF-101 loads 32 frame JPEGs per clip,
// dataset_ucf101.py:66-79). Same contract as i2v_decode_videos.
int i2v_decode_jpegs(const char** paths, int n, int threads, uint8_t** outs,
                     int* ws, int* hs, int* rcs) {
  if (n <= 0) return 0;
  int workers = threads > 0 ? threads
                            : (int)std::thread::hardware_concurrency();
  workers = std::max(1, std::min(workers, n));
  std::atomic<int> next(0), ok(0);
  auto run = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      outs[i] = nullptr;
      ws[i] = hs[i] = 0;
      rcs[i] = i2v_decode_jpeg(paths[i], &outs[i], &ws[i], &hs[i]);
      if (rcs[i] == 0) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < workers; ++t) pool.emplace_back(run);
  run();
  for (auto& t : pool) t.join();
  return ok.load();
}

}  // extern "C"
