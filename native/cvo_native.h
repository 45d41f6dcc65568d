/* C API of the native host runtime for the TPU visual-odometry framework.
 *
 * These are the host-side components the reference implements in C++
 * (image loading via cv::imread, reference src/utils.cpp:172-190; V4L2 Y8I
 * stereo capture, reference src/rgbd_standalone.cpp) rebuilt without the
 * OpenCV dependency: a zlib-based PNG decoder, a multithreaded lookahead
 * prefetcher that keeps the decode off the device-feed critical path
 * (SURVEY.md section 7 "host-side image streaming"), and a V4L2 capture
 * unit. Consumed from Python via ctypes (visual_odom_tpu/io/native.py).
 *
 * All functions return 0 on success and a negative errno-style code on
 * failure unless documented otherwise.
 */

#ifndef CVO_NATIVE_H
#define CVO_NATIVE_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---------------- PNG decode ---------------- */

/* Parse only the IHDR of `path`; writes height/width of the decoded
 * grayscale output. */
int cvo_png_info(const char *path, int32_t *height, int32_t *width);

/* Decode an 8/16-bit gray / RGB / RGBA / gray+alpha PNG to 8-bit grayscale
 * (BT.601 fixed-point weights, matching cv::cvtColor BGR2GRAY used at
 * reference src/utils.cpp:179,188). `out` must hold height*width bytes as
 * reported by cvo_png_info. */
int cvo_decode_png_gray(const char *path, uint8_t *out, size_t out_len);

/* Same, from an in-memory PNG byte buffer. */
int cvo_decode_png_gray_mem(const uint8_t *buf, size_t len, uint8_t *out,
                            size_t out_len, int32_t *height, int32_t *width);

/* ---------------- Prefetching dataset loader ---------------- */

typedef struct cvo_prefetcher cvo_prefetcher;

/* Start `n_threads` decode workers over `n_paths` PNG files with a
 * `capacity`-frame lookahead ring. All frames must share one geometry
 * (height/width taken from the first file). Returns NULL on failure. */
cvo_prefetcher *cvo_prefetcher_create(const char **paths, int32_t n_paths,
                                      int32_t n_threads, int32_t capacity);

int32_t cvo_prefetcher_height(const cvo_prefetcher *p);
int32_t cvo_prefetcher_width(const cvo_prefetcher *p);

/* Blocking in-order fetch of the next frame into `out` (height*width
 * bytes). Returns the frame index, or a negative code: -1 end of sequence,
 * -EIO decode failure on that frame. */
int64_t cvo_prefetcher_next(cvo_prefetcher *p, uint8_t *out, size_t out_len);

void cvo_prefetcher_destroy(cvo_prefetcher *p);

/* ---------------- V4L2 stereo capture (Y8I) ---------------- */

/* Split an interleaved Y8I buffer (16 bits/pixel: low byte = left IR image,
 * high byte = right, reference src/rgbd_standalone.cpp:186-193) into two
 * 8-bit planes. Pure function, exported for tests. */
void cvo_deinterlace_y8i(const uint8_t *interleaved, int32_t height,
                         int32_t width, uint8_t *left, uint8_t *right);

typedef struct cvo_v4l2 cvo_v4l2;

/* Open `device` (e.g. "/dev/video1"), request Y8I height x width, start
 * MMAP streaming. `discard` initial frames are thrown away (reference
 * discards 10, src/main.cpp:101-106). Returns NULL on failure. */
cvo_v4l2 *cvo_v4l2_open(const char *device, int32_t width, int32_t height,
                        int32_t discard);

/* Blocking grab of one stereo pair into two height*width planes. */
int cvo_v4l2_grab(cvo_v4l2 *cam, uint8_t *left, uint8_t *right);

void cvo_v4l2_close(cvo_v4l2 *cam);

#ifdef __cplusplus
}
#endif

#endif /* CVO_NATIVE_H */
