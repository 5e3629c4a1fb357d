// Minimal header-only htslib/sam.h shim: just enough BAM reading to
// compile and run the reference's extract_unmapped.cpp UNMODIFIED
// (/root/reference/src/cpptools/extract_unmapped.cpp) for true
// binary-level parity testing against pangaea_tpu.asm.unmapped — the
// real htslib is absent from this environment and cannot be fetched.
//
// Scope: sequential BAM reading only (BGZF inflate via zlib wbits=31 —
// BGZF blocks are standard gzip members — header parse, record parse
// into the on-disk variable-data layout, the accessor macros that
// layout implies, bam_endpos, bam_aux_get/bam_aux2i). API names, field
// names, flag semantics and return conventions follow the public
// htslib documentation; everything here is implemented from the BAM
// format specification (SAMv1.pdf), not copied from htslib.
//
// One deliberate guard: the reference reads target_len[tid] and
// target_name[tid] BEFORE its unmapped-record check, so tid == -1
// indexes both arrays at -1 (benign in practice with real htslib).
// The shim allocates one extra slot below each array and exposes
// pointer+1, making index -1 a defined read (0 / NULL) with identical
// observable behavior.

#ifndef PANGAEA_HTSLIB_SHIM_SAM_H
#define PANGAEA_HTSLIB_SHIM_SAM_H

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#ifdef __cplusplus
extern "C" {
#endif

// ---------------------------------------------------------------- types

typedef struct {
    int32_t tid;
    int32_t pos;
    uint8_t l_qname;  // includes the trailing NUL (no extranul padding)
    uint8_t qual;
    uint16_t bin;
    uint16_t n_cigar;
    uint16_t flag;
    int32_t l_qseq;
    int32_t mtid;
    int32_t mpos;
    int32_t isize;
} bam1_core_t;

typedef struct {
    bam1_core_t core;
    int l_data;
    int m_data;
    uint8_t* data;  // qname | cigar | seq(4-bit) | qual | aux — BAM layout
} bam1_t;

typedef struct {
    int32_t n_targets;
    uint32_t* target_len;  // points at slot 1 of an (n+1)-slot alloc
    char** target_name;    // likewise; index -1 is a defined NULL
    char* text;
    uint32_t l_text;
} bam_hdr_t;

typedef struct {
    FILE* fp;
    z_stream zs;
    unsigned char* in_buf;
    unsigned char* out_buf;
    int out_len;
    int out_pos;
    int in_eof;
    int eof;
} samFile;

static const char seq_nt16_str[] = "=ACMGRSVTWYHKDBN";

// --------------------------------------------------------------- macros

#define bam_get_qname(b) ((char*)(b)->data)
#define bam_get_cigar(b) ((uint32_t*)((b)->data + (b)->core.l_qname))
#define bam_get_seq(b) \
    ((b)->data + (b)->core.l_qname + ((b)->core.n_cigar << 2))
#define bam_get_qual(b) (bam_get_seq(b) + (((b)->core.l_qseq + 1) >> 1))
#define bam_get_aux(b) (bam_get_qual(b) + (b)->core.l_qseq)
#define bam_get_l_aux(b) \
    ((b)->l_data - ((bam_get_aux(b)) - (b)->data))
#define bam_seqi(s, i) ((s)[(i) >> 1] >> ((~(i)&1) << 2) & 0xf)
#define bam_cigar_op(c) ((c) & 0xf)
#define bam_cigar_oplen(c) ((c) >> 4)
#define bam_cigar_opchr(c) ("MIDNSHP=XB??????"[bam_cigar_op(c)])

#define BAM_FPAIRED 1
#define BAM_FUNMAP 4
#define BAM_FREVERSE 16
#define BAM_FREAD1 64
#define BAM_FREAD2 128
#define BAM_FSECONDARY 256
#define BAM_FSUPPLEMENTARY 2048

// ---------------------------------------------------- stream plumbing

#define PGN_SHIM_BUF (1 << 20)

static int pgn_shim_fill_(samFile* fp) {
    if (fp->eof) return 0;
    fp->out_pos = 0;
    fp->zs.next_out = fp->out_buf;
    fp->zs.avail_out = PGN_SHIM_BUF;
    while (fp->zs.avail_out > 0) {
        if (fp->zs.avail_in == 0 && !fp->in_eof) {
            size_t got = fread(fp->in_buf, 1, PGN_SHIM_BUF, fp->fp);
            if (got == 0) fp->in_eof = 1;
            fp->zs.next_in = fp->in_buf;
            fp->zs.avail_in = (unsigned)got;
        }
        if (fp->zs.avail_in == 0 && fp->in_eof) break;
        int ret = inflate(&fp->zs, Z_NO_FLUSH);
        if (ret == Z_STREAM_END) {
            inflateReset2(&fp->zs, 31);  // next BGZF member
            if (fp->zs.avail_in == 0 && fp->in_eof) break;
        } else if (ret == Z_BUF_ERROR && fp->zs.avail_in == 0 &&
                   fp->in_eof) {
            break;
        } else if (ret != Z_OK && ret != Z_BUF_ERROR) {
            break;
        }
    }
    fp->out_len = PGN_SHIM_BUF - (int)fp->zs.avail_out;
    if (fp->out_len <= 0) {
        fp->eof = 1;
        return 0;
    }
    return 1;
}

// read exactly n decompressed bytes; 0 on EOF, -1 on truncation
static int pgn_shim_read_(samFile* fp, void* dst, int n) {
    uint8_t* p = (uint8_t*)dst;
    int got = 0;
    while (got < n) {
        if (fp->out_pos >= fp->out_len && !pgn_shim_fill_(fp))
            return got == 0 ? 0 : -1;
        int take = fp->out_len - fp->out_pos;
        if (take > n - got) take = n - got;
        memcpy(p + got, fp->out_buf + fp->out_pos, take);
        fp->out_pos += take;
        got += take;
    }
    return n;
}

// ------------------------------------------------------------------ API

static samFile* hts_open(const char* path, const char* mode) {
    (void)mode;  // sequential read-only shim
    FILE* f = fopen(path, "rb");
    if (!f) return NULL;
    samFile* fp = (samFile*)calloc(1, sizeof(samFile));
    fp->fp = f;
    fp->in_buf = (unsigned char*)malloc(PGN_SHIM_BUF);
    fp->out_buf = (unsigned char*)malloc(PGN_SHIM_BUF);
    if (inflateInit2(&fp->zs, 31) != Z_OK) {
        fclose(f);
        free(fp->in_buf);
        free(fp->out_buf);
        free(fp);
        return NULL;
    }
    return fp;
}

static int sam_close(samFile* fp) {
    if (!fp) return -1;
    inflateEnd(&fp->zs);
    fclose(fp->fp);
    free(fp->in_buf);
    free(fp->out_buf);
    free(fp);
    return 0;
}

static bam_hdr_t* sam_hdr_read(samFile* fp) {
    char magic[4];
    if (pgn_shim_read_(fp, magic, 4) != 4 ||
        memcmp(magic, "BAM\1", 4) != 0)
        return NULL;
    bam_hdr_t* h = (bam_hdr_t*)calloc(1, sizeof(bam_hdr_t));
    int32_t l_text = 0;
    pgn_shim_read_(fp, &l_text, 4);
    h->l_text = (uint32_t)l_text;
    h->text = (char*)malloc((size_t)l_text + 1);
    pgn_shim_read_(fp, h->text, l_text);
    h->text[l_text] = 0;
    pgn_shim_read_(fp, &h->n_targets, 4);
    uint32_t* lens =
        (uint32_t*)calloc((size_t)h->n_targets + 1, sizeof(uint32_t));
    char** names = (char**)calloc((size_t)h->n_targets + 1, sizeof(char*));
    for (int32_t i = 0; i < h->n_targets; ++i) {
        int32_t l_name = 0;
        pgn_shim_read_(fp, &l_name, 4);
        names[i + 1] = (char*)malloc((size_t)l_name);
        pgn_shim_read_(fp, names[i + 1], l_name);
        int32_t l_ref = 0;
        pgn_shim_read_(fp, &l_ref, 4);
        lens[i + 1] = (uint32_t)l_ref;
    }
    h->target_len = lens + 1;   // tid -1 -> defined 0
    h->target_name = names + 1; // tid -1 -> defined NULL
    return h;
}

static void bam_hdr_destroy(bam_hdr_t* h) {
    if (!h) return;
    for (int32_t i = 0; i < h->n_targets; ++i) free(h->target_name[i]);
    free(h->target_name - 1);
    free(h->target_len - 1);
    free(h->text);
    free(h);
}

static const char* sam_hdr_tid2name(const bam_hdr_t* h, int tid) {
    if (!h || tid < 0 || tid >= h->n_targets) return NULL;
    return h->target_name[tid];
}

static int sam_hdr_tid2len(const bam_hdr_t* h, int tid) {
    if (!h || tid < 0 || tid >= h->n_targets) return 0;
    return (int)h->target_len[tid];
}

static bam1_t* bam_init1(void) {
    return (bam1_t*)calloc(1, sizeof(bam1_t));
}

static void bam_destroy1(bam1_t* b) {
    if (!b) return;
    free(b->data);
    free(b);
}

static int sam_read1(samFile* fp, bam_hdr_t* h, bam1_t* b) {
    (void)h;
    int32_t block_size = 0;
    int r = pgn_shim_read_(fp, &block_size, 4);
    if (r == 0) return -1;  // clean EOF
    if (r != 4 || block_size < 32) return -2;
    uint8_t fixed[32];
    if (pgn_shim_read_(fp, fixed, 32) != 32) return -2;
    int32_t refID, pos, l_seq, next_refID, next_pos, tlen;
    memcpy(&refID, fixed + 0, 4);
    memcpy(&pos, fixed + 4, 4);
    uint8_t l_read_name = fixed[8];
    uint8_t mapq = fixed[9];
    uint16_t bin, n_cigar, flag;
    memcpy(&bin, fixed + 10, 2);
    memcpy(&n_cigar, fixed + 12, 2);
    memcpy(&flag, fixed + 14, 2);
    memcpy(&l_seq, fixed + 16, 4);
    memcpy(&next_refID, fixed + 20, 4);
    memcpy(&next_pos, fixed + 24, 4);
    memcpy(&tlen, fixed + 28, 4);
    int l_data = block_size - 32;
    if (l_data < 0) return -2;
    if (b->m_data < l_data) {
        b->data = (uint8_t*)realloc(b->data, (size_t)l_data);
        b->m_data = l_data;
    }
    if (l_data && pgn_shim_read_(fp, b->data, l_data) != l_data) return -2;
    b->l_data = l_data;
    b->core.tid = refID;
    b->core.pos = pos;
    b->core.l_qname = l_read_name;
    b->core.qual = mapq;
    b->core.bin = bin;
    b->core.n_cigar = n_cigar;
    b->core.flag = flag;
    b->core.l_qseq = l_seq;
    b->core.mtid = next_refID;
    b->core.mpos = next_pos;
    b->core.isize = tlen;
    return block_size;
}

// htslib contract: unmapped or cigarless reads return pos + 1; else the
// rightmost ref coordinate (0-based, exclusive) from ref-consuming ops.
static int64_t bam_endpos(const bam1_t* b) {
    if ((b->core.flag & BAM_FUNMAP) || b->core.n_cigar == 0)
        return b->core.pos + 1;
    const uint32_t* cig = bam_get_cigar(b);
    int64_t end = b->core.pos;
    for (int i = 0; i < b->core.n_cigar; ++i) {
        uint32_t c;
        memcpy(&c, (const uint8_t*)cig + 4 * (size_t)i, 4);
        int op = bam_cigar_op(c);
        // M, D, N, =, X consume the reference
        if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
            end += bam_cigar_oplen(c);
    }
    return end;
}

// bytes of the VALUE that follows a type char (type at `type_p`,
// value at `type_p + 1`); -1 on malformed aux data
static int pgn_shim_aux_valsize_(const uint8_t* type_p,
                                 const uint8_t* end) {
    const uint8_t* v = type_p + 1;
    switch (*type_p) {
        case 'A': case 'c': case 'C': return 1;
        case 's': case 'S': return 2;
        case 'i': case 'I': case 'f': return 4;
        case 'd': return 8;
        case 'Z': case 'H': {
            const uint8_t* p = v;
            while (p < end && *p) ++p;
            return (int)(p - v) + 1;  // value + trailing NUL
        }
        case 'B': {
            if (end - v < 5) return -1;
            int esz;
            switch (*v) {
                case 'c': case 'C': esz = 1; break;
                case 's': case 'S': esz = 2; break;
                case 'i': case 'I': case 'f': esz = 4; break;
                default: return -1;
            }
            int32_t n;
            memcpy(&n, v + 1, 4);
            return 5 + esz * n;
        }
        default: return -1;
    }
}

// htslib convention: returns a pointer to the TYPE byte of the tag's
// value (so bam_aux2i reads s[0] as the type), NULL when absent.
static uint8_t* bam_aux_get(const bam1_t* b, const char tag[2]) {
    uint8_t* s = bam_get_aux(b);
    uint8_t* end = b->data + b->l_data;
    while (s + 4 <= end) {  // tag(2) + type(1) + >=1 value byte
        int vsz = pgn_shim_aux_valsize_(s + 2, end);
        if (vsz < 0) return NULL;
        if (s[0] == (uint8_t)tag[0] && s[1] == (uint8_t)tag[1])
            return s + 2;
        s += 3 + vsz;
    }
    return NULL;
}

static int64_t bam_aux2i(const uint8_t* s) {
    switch (*s) {
        case 'c': return *(const int8_t*)(s + 1);
        case 'C': return *(const uint8_t*)(s + 1);
        case 's': { int16_t v; memcpy(&v, s + 1, 2); return v; }
        case 'S': { uint16_t v; memcpy(&v, s + 1, 2); return v; }
        case 'i': { int32_t v; memcpy(&v, s + 1, 4); return v; }
        case 'I': { uint32_t v; memcpy(&v, s + 1, 4); return v; }
        default: return 0;
    }
}

#ifdef __cplusplus
}
#endif

#endif  // PANGAEA_HTSLIB_SHIM_SAM_H
