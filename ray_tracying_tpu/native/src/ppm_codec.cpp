// Fast ASCII P3 PPM codec (native counterpart of io/ppm.py).
//
// The reference's Image::read/write (Code/image.cpp:53-133) stream ints
// through iostreams one at a time — fine for 64x64 textures, painful for
// 1920x1080 frames (~25 MB of ASCII).  This codec slurps the file and
// hand-scans integers (read), and emits via a preallocated byte buffer
// (write), reproducing the reference writer's exact byte layout:
// "P3\n<w> <h>\n255\n" then rows of "r g b  r g b ...\n" (two spaces
// between pixels, one between channels).
//
// C ABI for ctypes; no Python headers needed.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Reads header only: returns 0 on success and fills w/h.
int ppm_read_header(const char* path, int32_t* w, int32_t* h) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<char> buf(n > 4096 ? 4096 : n);
    size_t got = std::fread(buf.data(), 1, buf.size(), f);
    std::fclose(f);
    if (got < 2 || buf[0] != 'P' || buf[1] != '3') return -2;
    // Scan up to 3 ints (w, h, maxval) skipping comments.
    size_t i = 2;
    int vals[2];
    int nv = 0;
    while (i < got && nv < 2) {
        char ch = buf[i];
        if (ch == '#') {
            while (i < got && buf[i] != '\n') i++;
        } else if (ch >= '0' && ch <= '9') {
            int v = 0;
            while (i < got && buf[i] >= '0' && buf[i] <= '9') {
                v = v * 10 + (buf[i] - '0');
                i++;
            }
            vals[nv++] = v;
            continue;
        }
        i++;
    }
    if (nv < 2) return -3;
    *w = vals[0];
    *h = vals[1];
    return 0;
}

// Reads the full image into out (w*h*3 bytes, caller-allocated).
// Values clamp to [0,255] like the reference reader (Code/image.cpp:127).
int ppm_read_pixels(const char* path, uint8_t* out, int64_t count) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<char> buf(n);
    size_t got = std::fread(buf.data(), 1, n, f);
    std::fclose(f);
    if (got < 2 || buf[0] != 'P' || buf[1] != '3') return -2;

    size_t i = 2;
    int64_t nv = 0;
    int header_ints = 0;  // w, h, maxval come first
    while (i < got) {
        char ch = buf[i];
        if (ch == '#') {
            while (i < got && buf[i] != '\n') i++;
        } else if (ch >= '0' && ch <= '9') {
            long v = 0;
            while (i < got && buf[i] >= '0' && buf[i] <= '9') {
                v = v * 10 + (buf[i] - '0');
                i++;
            }
            if (header_ints < 3) {
                header_ints++;
            } else {
                if (nv >= count) return -4;
                out[nv++] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
            }
            continue;
        }
        i++;
    }
    return nv == count ? 0 : -5;
}

// Writes w*h*3 bytes as ASCII P3 with the reference's separators.
int ppm_write(const char* path, const uint8_t* img, int32_t w, int32_t h) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    // Worst case per pixel: "255 255 255  " = 13 bytes + row newline.
    std::vector<char> buf;
    buf.reserve((size_t)w * h * 13 + 64);
    char head[64];
    int hn = std::snprintf(head, sizeof(head), "P3\n%d %d\n255\n", w, h);
    buf.insert(buf.end(), head, head + hn);

    char tmp[4];
    auto put_int = [&](uint8_t v) {
        int len = 0;
        if (v >= 100) tmp[len++] = '0' + v / 100;
        if (v >= 10) tmp[len++] = '0' + (v / 10) % 10;
        tmp[len++] = '0' + v % 10;
        buf.insert(buf.end(), tmp, tmp + len);
    };

    const uint8_t* p = img;
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
            put_int(p[0]);
            buf.push_back(' ');
            put_int(p[1]);
            buf.push_back(' ');
            put_int(p[2]);
            p += 3;
            if (x < w - 1) {
                buf.push_back(' ');
                buf.push_back(' ');
            }
        }
        buf.push_back('\n');
    }
    size_t wrote = std::fwrite(buf.data(), 1, buf.size(), f);
    std::fclose(f);
    return wrote == buf.size() ? 0 : -2;
}

}  // extern "C"
