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

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
#include <jpeglib.h>
}

extern "C" {

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

  auto emit = [&](AVFrame* f) {
    if (!sws) {
      sws = sws_getContext(f->width, f->height, (AVPixelFormat)f->format,
                           width, height, AV_PIX_FMT_RGB24, SWS_BILINEAR,
                           nullptr, nullptr, nullptr);
    }
    if (count == cap) {
      cap *= 2;
      buf = (uint8_t*)realloc(buf, cap * frame_bytes);
    }
    uint8_t* dst[1] = {buf + count * frame_bytes};
    int dst_stride[1] = {width * 3};
    sws_scale(sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
    ++count;
  };

  int err = 0;
  while (av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == vstream) {
      if (avcodec_send_packet(ctx, pkt) == 0) {
        while (avcodec_receive_frame(ctx, frame) == 0) emit(frame);
      }
    }
    av_packet_unref(pkt);
  }
  // drain
  avcodec_send_packet(ctx, nullptr);
  while (avcodec_receive_frame(ctx, frame) == 0) emit(frame);

  if (sws) sws_freeContext(sws);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);

  if (count == 0) {
    free(buf);
    return -5;
  }
  *out = buf;
  *n_frames = (int)count;
  return err;
}

// Decode a JPEG file to (height, width, 3) uint8 RGB.
int i2v_decode_jpeg(const char* path, uint8_t** out, int* w, int* h) {
  *out = nullptr;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
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
  uint8_t* buf = (uint8_t*)malloc((size_t)(*h) * stride);
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

}  // extern "C"
