// V4L2 stereo (Y8I interleaved) capture unit.
//
// Native equivalent of the reference's Intel_V4L2 RGB-D capture
// (reference src/rgbd_standalone.cpp): open a V4L2 device, stream the Y8I
// fourcc (16 bits/pixel, left IR in the low byte, right IR in the high
// byte, deinterlaced at reference :186-193), deliver 8-bit stereo planes.
// Differences from the reference, deliberately: MMAP buffers instead of a
// single USERPTR buffer (no alignment footguns), poll() with a timeout
// instead of fixed 100 ms usleep loops (reference :144-176), and errors
// are returned, not printf-and-exit.

#include "cvo_native.h"

#include <errno.h>
#include <string.h>

#include <vector>

extern "C" void cvo_deinterlace_y8i(const uint8_t *interleaved,
                                    int32_t height, int32_t width,
                                    uint8_t *left, uint8_t *right) {
  const size_t n = size_t(height) * size_t(width);
  for (size_t i = 0; i < n; ++i) {
    left[i] = interleaved[2 * i];       // low byte  (reference :188-190)
    right[i] = interleaved[2 * i + 1];  // high byte (reference :191-192)
  }
}

#ifdef __linux__

#include <fcntl.h>
#include <linux/videodev2.h>
#include <poll.h>
#include <sys/ioctl.h>
#include <sys/mman.h>
#include <unistd.h>

#ifndef V4L2_PIX_FMT_Y8I
#define V4L2_PIX_FMT_Y8I v4l2_fourcc('Y', '8', 'I', ' ')
#endif

namespace {
constexpr int kNumBuffers = 4;
constexpr int kPollTimeoutMs = 2000;

int xioctl(int fd, unsigned long req, void *arg) {
  int r;
  do {
    r = ioctl(fd, req, arg);
  } while (r == -1 && errno == EINTR);
  return r;
}
}  // namespace

struct cvo_v4l2 {
  int fd = -1;
  int32_t width = 0, height = 0;
  void *maps[kNumBuffers] = {};
  size_t map_lens[kNumBuffers] = {};
};

extern "C" cvo_v4l2 *cvo_v4l2_open(const char *device, int32_t width,
                                   int32_t height, int32_t discard) {
  int fd = open(device, O_RDWR | O_NONBLOCK);
  if (fd < 0) return nullptr;
  auto *cam = new cvo_v4l2();
  cam->fd = fd;
  cam->width = width;
  cam->height = height;

  v4l2_format fmt;
  memset(&fmt, 0, sizeof(fmt));
  fmt.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
  fmt.fmt.pix.width = __u32(width);
  fmt.fmt.pix.height = __u32(height);
  fmt.fmt.pix.pixelformat = V4L2_PIX_FMT_Y8I;
  fmt.fmt.pix.field = V4L2_FIELD_NONE;
  if (xioctl(fd, VIDIOC_S_FMT, &fmt) == -1) goto fail;

  {
    v4l2_requestbuffers req;
    memset(&req, 0, sizeof(req));
    req.count = kNumBuffers;
    req.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    req.memory = V4L2_MEMORY_MMAP;
    if (xioctl(fd, VIDIOC_REQBUFS, &req) == -1 || req.count < 2) goto fail;

    for (__u32 i = 0; i < req.count && i < kNumBuffers; ++i) {
      v4l2_buffer buf;
      memset(&buf, 0, sizeof(buf));
      buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
      buf.memory = V4L2_MEMORY_MMAP;
      buf.index = i;
      if (xioctl(fd, VIDIOC_QUERYBUF, &buf) == -1) goto fail;
      cam->maps[i] = mmap(nullptr, buf.length, PROT_READ | PROT_WRITE,
                          MAP_SHARED, fd, buf.m.offset);
      if (cam->maps[i] == MAP_FAILED) {
        cam->maps[i] = nullptr;
        goto fail;
      }
      cam->map_lens[i] = buf.length;
      if (xioctl(fd, VIDIOC_QBUF, &buf) == -1) goto fail;
    }
  }

  {
    v4l2_buf_type type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    if (xioctl(fd, VIDIOC_STREAMON, &type) == -1) goto fail;
  }

  // Warm-up discard (the reference throws away the first 10 frames,
  // src/main.cpp:101-106).
  for (int32_t i = 0; i < discard; ++i) {
    std::vector<uint8_t> l(size_t(width) * height),
        r(size_t(width) * height);
    if (cvo_v4l2_grab(cam, l.data(), r.data()) != 0) break;
  }
  return cam;

fail:
  cvo_v4l2_close(cam);
  return nullptr;
}

extern "C" int cvo_v4l2_grab(cvo_v4l2 *cam, uint8_t *left, uint8_t *right) {
  if (!cam || cam->fd < 0) return -EINVAL;
  pollfd pfd = {cam->fd, POLLIN, 0};
  int pr = poll(&pfd, 1, kPollTimeoutMs);
  if (pr <= 0) return pr == 0 ? -ETIMEDOUT : -errno;

  v4l2_buffer buf;
  memset(&buf, 0, sizeof(buf));
  buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
  buf.memory = V4L2_MEMORY_MMAP;
  if (xioctl(cam->fd, VIDIOC_DQBUF, &buf) == -1) return -errno;

  const size_t need = size_t(cam->width) * size_t(cam->height) * 2;
  int rc = 0;
  if (buf.bytesused < need || buf.index >= kNumBuffers ||
      !cam->maps[buf.index]) {
    rc = -EIO;
  } else {
    cvo_deinterlace_y8i(
        static_cast<const uint8_t *>(cam->maps[buf.index]), cam->height,
        cam->width, left, right);
  }
  if (xioctl(cam->fd, VIDIOC_QBUF, &buf) == -1) return -errno;
  return rc;
}

extern "C" void cvo_v4l2_close(cvo_v4l2 *cam) {
  if (!cam) return;
  if (cam->fd >= 0) {
    v4l2_buf_type type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    xioctl(cam->fd, VIDIOC_STREAMOFF, &type);
    for (int i = 0; i < kNumBuffers; ++i)
      if (cam->maps[i]) munmap(cam->maps[i], cam->map_lens[i]);
    close(cam->fd);
  }
  delete cam;
}

#else  // !__linux__

extern "C" cvo_v4l2 *cvo_v4l2_open(const char *, int32_t, int32_t, int32_t) {
  return nullptr;
}
extern "C" int cvo_v4l2_grab(cvo_v4l2 *, uint8_t *, uint8_t *) {
  return -ENOTSUP;
}
extern "C" void cvo_v4l2_close(cvo_v4l2 *) {}

#endif  // __linux__
