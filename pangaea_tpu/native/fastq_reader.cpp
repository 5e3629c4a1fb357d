// Native FASTQ stream reader: gzip/plain, barcode extraction, 2-bit encode.
//
// TPU-native replacement for the host-side hot loop of the reference's
// C++ tools (count_kmer.cpp:186-292 does gzstream + header parse + barcode
// extraction before any counting): reads FASTQ records in bulk and emits
//   codes    (n, max_len) uint8 : A=0,C=1,T=2,G=3, 4 = N/pad/qual-masked
//            ((ascii >> 1) & 3, count_kmer.cpp:81)
//   lengths  (n,)        int32  : full read length (may exceed max_len —
//            callers re-split overlong reads host-side; linked reads are
//            short so this path is cold)
//   barcodes (n, bc_w)   char   : NUL-padded extracted barcode
//   names    (n, nm_w)   char   : NUL-padded read name
// Barcode rules mirror getBarcode (count_kmer.cpp:25-53): sticky type
// inference, BX:Z => 10x (value up to '-'), '#' => stLFR (between '#'
// and '/', "0_0_0" -> empty).
//
// C ABI only (ctypes binding in pangaea_tpu/native/__init__.py).
// Build: g++ -O3 -shared -fPIC fastq_reader.cpp -o libpangaea_io.so -lz

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

namespace {

constexpr int kBufSize = 1 << 20;

// Raw z_stream inflate (~256 MB/s on this host) instead of gzread
// (~50 MB/s: its internal windowing copies dominate).
struct Reader {
    FILE* fp = nullptr;
    bool is_gz = false;
    z_stream zs{};
    unsigned char* in_buf = nullptr;  // compressed input
    char* buf = nullptr;              // decompressed output
    int buf_len = 0;
    int buf_pos = 0;
    bool eof = false;
    bool in_eof = false;
    int read_type = 0;  // 0 unknown, 1 = 10x, 2 = stLFR
    int min_qual = 0;   // 0 = no masking; else ASCII threshold
    std::string line;   // scratch

    bool fill() {
        if (eof) return false;
        buf_pos = 0;
        if (!is_gz) {
            buf_len = static_cast<int>(fread(buf, 1, kBufSize, fp));
            if (buf_len <= 0) {
                eof = true;
                return false;
            }
            return true;
        }
        zs.next_out = reinterpret_cast<unsigned char*>(buf);
        zs.avail_out = kBufSize;
        while (zs.avail_out > 0) {
            if (zs.avail_in == 0 && !in_eof) {
                size_t got = fread(in_buf, 1, kBufSize, fp);
                if (got == 0) in_eof = true;
                zs.next_in = in_buf;
                zs.avail_in = static_cast<unsigned>(got);
            }
            if (zs.avail_in == 0 && in_eof) break;
            int ret = inflate(&zs, Z_NO_FLUSH);
            if (ret == Z_STREAM_END) {
                // concatenated gzip members (BGZF etc.): restart
                inflateReset2(&zs, 31);
                if (zs.avail_in == 0 && in_eof) break;
            } else if (ret != Z_OK && ret != Z_BUF_ERROR) {
                break;  // corrupt stream: stop at what we have
            } else if (ret == Z_BUF_ERROR && zs.avail_in == 0 && in_eof) {
                break;
            }
        }
        buf_len = kBufSize - static_cast<int>(zs.avail_out);
        if (buf_len <= 0) {
            eof = true;
            return false;
        }
        return true;
    }

    // next line into `line` (no trailing \n); false on EOF
    bool getline(std::string& out) {
        out.clear();
        while (true) {
            if (buf_pos >= buf_len && !fill()) return !out.empty();
            char* start = buf + buf_pos;
            char* nl = static_cast<char*>(
                memchr(start, '\n', buf_len - buf_pos));
            if (nl) {
                out.append(start, nl - start);
                buf_pos = (nl - buf) + 1;
                if (!out.empty() && out.back() == '\r') out.pop_back();
                return true;
            }
            out.append(start, buf_len - buf_pos);
            buf_pos = buf_len;
        }
    }
};

uint8_t kEnc[256];
struct EncInit {
    EncInit() {
        memset(kEnc, 4, sizeof(kEnc));
        kEnc[uint8_t('A')] = 0;
        kEnc[uint8_t('C')] = 1;
        kEnc[uint8_t('T')] = 2;
        kEnc[uint8_t('G')] = 3;
    }
} enc_init;

// getBarcode: (name, barcode) from a '@'-stripped header.
void parse_header(Reader* r, const std::string& header, std::string& name,
                  std::string& barcode) {
    if (r->read_type == 0) {
        if (header.find("BX:Z") != std::string::npos)
            r->read_type = 1;
        else if (header.find('#') != std::string::npos)
            r->read_type = 2;
    }
    name.clear();
    barcode.clear();
    if (r->read_type == 2) {
        size_t pos1 = header.find('#');
        size_t pos2 = header.find('/', pos1 + 1);
        name = header.substr(0, pos1);
        barcode = header.substr(
            pos1 + 1,
            (pos2 == std::string::npos ? header.size() : pos2) - pos1 - 1);
        if (barcode == "0_0_0") barcode.clear();
        return;
    }
    size_t end = header.find_first_of(" \r\t\n");
    name = header.substr(0, end);
    size_t pos1 = header.find("BX:Z");
    if (pos1 != std::string::npos) {
        size_t pos2 = header.find('-', pos1 + 5);
        barcode = header.substr(
            pos1 + 5,
            (pos2 == std::string::npos ? header.size() : pos2) - pos1 - 5);
    }
}

void put_str(char* dst, int width, const std::string& s) {
    int n = static_cast<int>(s.size());
    if (n > width - 1) n = width - 1;
    memcpy(dst, s.data(), n);
    memset(dst + n, 0, width - n);
}

}  // namespace

extern "C" {

void* pgn_open(const char* path, int min_qual_char) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return nullptr;
    Reader* r = new Reader();
    r->fp = fp;
    r->buf = new char[kBufSize];
    r->min_qual = min_qual_char;
    // gzip magic sniff (not extension): 0x1f 0x8b
    int c1 = fgetc(fp), c2 = fgetc(fp);
    rewind(fp);
    r->is_gz = (c1 == 0x1f && c2 == 0x8b);
    if (r->is_gz) {
        r->in_buf = new unsigned char[kBufSize];
        r->zs.zalloc = Z_NULL;
        r->zs.zfree = Z_NULL;
        r->zs.opaque = Z_NULL;
        if (inflateInit2(&r->zs, 31) != Z_OK) {
            fclose(fp);
            delete[] r->buf;
            delete[] r->in_buf;
            delete r;
            return nullptr;
        }
    }
    return r;
}

void pgn_close(void* handle) {
    Reader* r = static_cast<Reader*>(handle);
    if (!r) return;
    if (r->is_gz) {
        inflateEnd(&r->zs);
        delete[] r->in_buf;
    }
    fclose(r->fp);
    delete[] r->buf;
    delete r;
}

// Read up to n records. Returns the number read (0 = EOF).
// codes may be null (skip encoding); barcodes/names may be null.
int pgn_read(void* handle, int n, int max_len, uint8_t* codes,
             int32_t* lengths, char* barcodes, int bc_w, char* names,
             int nm_w) {
    Reader* r = static_cast<Reader*>(handle);
    std::string header, seq, plus, qual, name, barcode;
    int i = 0;
    for (; i < n; ++i) {
        if (!r->getline(header)) break;
        if (!r->getline(seq)) break;
        if (!r->getline(plus)) break;
        if (!r->getline(qual)) break;
        const char* h = header.c_str();
        if (header[0] == '@') ++h;
        parse_header(r, std::string(h), name, barcode);
        int len = static_cast<int>(seq.size());
        lengths[i] = len;
        if (codes) {
            uint8_t* row = codes + static_cast<int64_t>(i) * max_len;
            int m = len < max_len ? len : max_len;
            for (int j = 0; j < m; ++j) row[j] = kEnc[uint8_t(seq[j])];
            if (r->min_qual > 0) {
                int qm = m < static_cast<int>(qual.size())
                             ? m
                             : static_cast<int>(qual.size());
                for (int j = 0; j < qm; ++j)
                    if (uint8_t(qual[j]) < r->min_qual) row[j] = 4;
            }
            for (int j = m; j < max_len; ++j) row[j] = 4;
        }
        if (barcodes) put_str(barcodes + static_cast<int64_t>(i) * bc_w,
                              bc_w, barcode);
        if (names) put_str(names + static_cast<int64_t>(i) * nm_w, nm_w,
                           name);
    }
    return i;
}

// Raw sequence fetch for overlong reads (rare path): re-reads are not
// possible on a stream, so callers that need full sequences set
// max_len large enough or use the Python fallback.

}  // extern "C"
