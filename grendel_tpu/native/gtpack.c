/* Native GT tile-row packing for the distributed data path.
 *
 * The per-step host job (reference counterpart: the GT row-slice movement
 * in /root/reference/gaussian_renderer/loss_distribution.py:2395-2533 and
 * the multiprocess image staging in utils/camera_utils.py:92-207): slice
 * each device's owned tile rows out of the batch's uint8 CHW images into
 * the (D, max_rows, 3, tile_h, W) staging buffer that is device_put with
 * a per-device sharding. In Python this is a per-row numpy loop; here it
 * is a tight memcpy loop parallelized across POSIX threads.
 *
 * Built by grendel_tpu/native/__init__.py with cc -O3 -shared -fPIC;
 * called through ctypes (no CPython API -> no interpreter coupling).
 */

#include <stdint.h>
#include <string.h>
#include <pthread.h>

typedef struct {
    const uint8_t **images;   /* B pointers to (3, H, W) uint8, NULL allowed */
    uint8_t *out;             /* (D, max_rows, 3, tile_h, W) */
    const int32_t *division;  /* (D+1,) global tile-row boundaries */
    int32_t n_devices;
    int32_t max_rows;
    int32_t tile_h;
    int32_t img_h;
    int32_t img_w;
    int32_t tiles_y;          /* tile rows per image */
    int32_t d_begin, d_end;   /* device range for this thread */
} PackJob;

static void *pack_worker(void *arg)
{
    PackJob *j = (PackJob *)arg;
    const int64_t W = j->img_w;
    const int64_t th = j->tile_h;
    const int64_t plane = (int64_t)j->img_h * W;       /* one image channel */
    const int64_t slot_ch = th * W;                    /* one slot channel  */
    const int64_t slot_sz = 3 * slot_ch;               /* one row slot      */
    const int64_t dev_sz = (int64_t)j->max_rows * slot_sz;

    for (int32_t d = j->d_begin; d < j->d_end; d++) {
        int32_t lo = j->division[d];
        int32_t hi = j->division[d + 1];
        uint8_t *dev_out = j->out + (int64_t)d * dev_sz;
        /* zero the whole device block first (padding rows + image bottom) */
        memset(dev_out, 0, dev_sz);
        for (int32_t row = lo; row < hi; row++) {
            int32_t slot = row - lo;
            if (slot >= j->max_rows) break;
            int32_t b = row / j->tiles_y;
            int32_t ty = row - b * j->tiles_y;
            const uint8_t *img = j->images[b];
            if (!img) continue;
            int64_t y0 = (int64_t)ty * th;
            int64_t y1 = y0 + th;
            if (y1 > j->img_h) y1 = j->img_h;
            int64_t lines = y1 - y0;
            if (lines <= 0) continue;
            uint8_t *slot_out = dev_out + (int64_t)slot * slot_sz;
            for (int c = 0; c < 3; c++) {
                memcpy(slot_out + c * slot_ch,
                       img + c * plane + y0 * W,
                       (size_t)(lines * W));
            }
        }
    }
    return NULL;
}

void pack_gt_rows_native(
    const uint8_t **images, uint8_t *out, const int32_t *division,
    int32_t n_devices, int32_t max_rows, int32_t tile_h,
    int32_t img_h, int32_t img_w, int32_t n_threads)
{
    int32_t tiles_y = (img_h + tile_h - 1) / tile_h;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > n_devices) n_threads = n_devices;

    pthread_t threads[64];
    PackJob jobs[64];
    if (n_threads > 64) n_threads = 64;

    int32_t per = (n_devices + n_threads - 1) / n_threads;
    int32_t started = 0;
    for (int32_t t = 0; t < n_threads; t++) {
        int32_t b = t * per;
        int32_t e = b + per;
        if (e > n_devices) e = n_devices;
        if (b >= e) break;
        jobs[t] = (PackJob){images, out, division, n_devices, max_rows,
                            tile_h, img_h, img_w, tiles_y, b, e};
        pthread_create(&threads[t], NULL, pack_worker, &jobs[t]);
        started++;
    }
    for (int32_t t = 0; t < started; t++)
        pthread_join(threads[t], NULL);
}
