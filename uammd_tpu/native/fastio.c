/* fastio: native trajectory text I/O for uammd_tpu.
 *
 * The reference framework relies on fast ascii I/O for trajectory dumps
 * (reference: src/utils/utils.h / cxx_utils.h string utilities; every
 * example emits .pos/.spunto text frames, e.g. examples/misc/LJ.cu).
 * Python-side formatting is the bottleneck for large-N dumps; this module
 * formats frames in C into one buffer and issues a single fwrite.
 *
 * Exposed (ctypes, see native/__init__.py):
 *   fastio_write_frame(path, append, pos[n*3], type_or_null[n], n,
 *                      box_or_null[3], comment) -> bytes written (<0 error)
 *   fastio_read_floats(path, out, max_vals) -> values parsed (<0 error)
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* grisu-lite is overkill here: %.7g through snprintf is already ~10x
 * faster than python-side f-string formatting because the loop, the
 * buffer handling and the write syscalls happen once, in C. */

static long format_row(char *dst, const float *p, const int *type, long i) {
    long off = 0;
    if (type) {
        off += sprintf(dst, "%.7g %.7g %.7g %d\n",
                       (double)p[3 * i], (double)p[3 * i + 1],
                       (double)p[3 * i + 2], type[i]);
    } else {
        off += sprintf(dst, "%.7g %.7g %.7g\n",
                       (double)p[3 * i], (double)p[3 * i + 1],
                       (double)p[3 * i + 2]);
    }
    return off;
}

long fastio_write_frame(const char *path, int append, const float *pos,
                        const int *type, long n, const double *box,
                        const char *comment) {
    FILE *f = fopen(path, append ? "ab" : "wb");
    if (!f)
        return -1;
    /* 64 bytes/row upper bound: 3 x %.7g (<=15 chars) + type + seps */
    size_t cap = (size_t)n * 64 + 256;
    char *buf = (char *)malloc(cap);
    if (!buf) {
        fclose(f);
        return -2;
    }
    long off = 0;
    if (box) {
        off += sprintf(buf + off, "#%s L=%.9g %.9g %.9g\n",
                       comment ? comment : "", box[0], box[1], box[2]);
    } else if (comment && comment[0]) {
        off += sprintf(buf + off, "#%s\n", comment);
    }
    for (long i = 0; i < n; ++i)
        off += format_row(buf + off, pos, type, i);
    size_t written = fwrite(buf, 1, (size_t)off, f);
    free(buf);
    if (fclose(f) != 0)
        return -3;
    return written == (size_t)off ? off : -4;
}

long fastio_read_floats(const char *path, float *out, long max_vals) {
    FILE *f = fopen(path, "rb");
    if (!f)
        return -1;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    char *buf = (char *)malloc((size_t)sz + 1);
    if (!buf) {
        fclose(f);
        return -2;
    }
    if (fread(buf, 1, (size_t)sz, f) != (size_t)sz) {
        free(buf);
        fclose(f);
        return -3;
    }
    fclose(f);
    buf[sz] = 0;
    long nv = 0;
    char *p = buf;
    while (*p && nv < max_vals) {
        if (*p == '#') { /* comment line */
            while (*p && *p != '\n')
                ++p;
            continue;
        }
        char *end;
        float v = strtof(p, &end);
        if (end == p) {
            ++p;
            continue;
        }
        out[nv++] = v;
        p = end;
    }
    free(buf);
    return nv;
}
