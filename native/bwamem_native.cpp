// Native host runtime for bwamem_tpu: streaming FASTA/FASTQ chunk
// reader with bwa's chunking semantics.
//
// Re-implements the reference's kseq.h lexer + bseq_read accumulation
// (reference: software/kseq.h, software/bwa.c:47-78): records carry
// (name, comment, seq, qual); paired files interleave 1:1; trailing
// "/<digit>" read-number suffixes are trimmed (software/bwa.c:32-36);
// a chunk ends once total bases >= chunk_bp with an even read count.
//
// Exposed as a C ABI consumed from Python via ctypes (no pybind11 in
// this environment).  String pointers returned by bm_fq_chunk stay
// valid until the next bm_fq_chunk/bm_fq_close call on the handle.

#include <zlib.h>

#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

class Stream {
 public:
  explicit Stream(const char* path) {
    fp_ = gzopen(path, "rb");  // zlib reads plain files transparently
    buf_.resize(1 << 16);
  }
  ~Stream() {
    if (fp_) gzclose(fp_);
  }
  bool ok() const { return fp_ != nullptr; }

  int getc_() {
    if (pos_ >= len_) {
      len_ = gzread(fp_, buf_.data(), static_cast<unsigned>(buf_.size()));
      pos_ = 0;
      if (len_ <= 0) return -1;
    }
    return static_cast<unsigned char>(buf_[pos_++]);
  }

  // read to end of line into s (appending); returns false on EOF with
  // nothing read
  bool getline_(std::string* s) {
    int c = getc_();
    if (c < 0) return false;
    while (c >= 0 && c != '\n') {
      if (c != '\r') s->push_back(static_cast<char>(c));
      c = getc_();
    }
    return true;
  }

  int peek() {
    if (pos_ >= len_) {
      len_ = gzread(fp_, buf_.data(), static_cast<unsigned>(buf_.size()));
      pos_ = 0;
      if (len_ <= 0) return -1;
    }
    return static_cast<unsigned char>(buf_[pos_]);
  }

 private:
  gzFile fp_ = nullptr;
  std::vector<char> buf_;
  int pos_ = 0, len_ = 0;
};

struct Record {
  std::string name, comment, seq, qual;
  bool has_comment = false, has_qual = false;
};

// kseq-equivalent record parser
class FastxParser {
 public:
  explicit FastxParser(const char* path) : st_(path) {}
  bool ok() const { return st_.ok(); }

  bool next(Record* r) {
    // find header
    int c = st_.peek();
    while (c >= 0 && c != '>' && c != '@') {
      std::string junk;
      if (!st_.getline_(&junk)) return false;
      c = st_.peek();
    }
    if (c < 0) return false;
    bool fastq = (c == '@');
    std::string hdr;
    if (!st_.getline_(&hdr)) return false;
    hdr.erase(0, 1);
    size_t sp = hdr.find_first_of(" \t");
    r->name = hdr.substr(0, sp);
    if (sp != std::string::npos) {
      size_t b = hdr.find_first_not_of(" \t", sp);
      r->has_comment = b != std::string::npos;
      r->comment = r->has_comment ? hdr.substr(b) : "";
    } else {
      r->has_comment = false;
      r->comment.clear();
    }
    r->seq.clear();
    r->qual.clear();
    r->has_qual = false;
    c = st_.peek();
    while (c >= 0 && c != '>' && c != '@' && c != '+') {
      std::string line;
      if (!st_.getline_(&line)) break;
      // strip whitespace like Python's .strip()
      size_t b = line.find_first_not_of(" \t");
      size_t e = line.find_last_not_of(" \t");
      if (b != std::string::npos) r->seq += line.substr(b, e - b + 1);
      c = st_.peek();
    }
    if (fastq && c == '+') {
      std::string plus;
      st_.getline_(&plus);
      while (r->qual.size() < r->seq.size()) {
        std::string ql;
        if (!st_.getline_(&ql)) break;
        r->qual += ql;
      }
      r->has_qual = true;
    }
    return true;
  }

 private:
  Stream st_;
};

void trim_readno(std::string* name) {
  // software/bwa.c:32-36
  size_t l = name->size();
  if (l > 2 && (*name)[l - 2] == '/' && isdigit((*name)[l - 1]))
    name->resize(l - 2);
}

struct Handle {
  FastxParser* p1 = nullptr;
  FastxParser* p2 = nullptr;
  std::vector<Record> records;
  std::vector<const char*> names, comments, seqs, quals;
  bool warned_short = false;
};

}  // namespace

extern "C" {

void* bm_fq_open(const char* path1, const char* path2) {
  Handle* h = new Handle();
  h->p1 = new FastxParser(path1);
  if (!h->p1->ok()) {
    delete h->p1;
    delete h;
    return nullptr;
  }
  if (path2 && path2[0]) {
    h->p2 = new FastxParser(path2);
    if (!h->p2->ok()) {
      delete h->p1;
      delete h->p2;
      delete h;
      return nullptr;
    }
  }
  return h;
}

// Returns the number of reads in the chunk (0 at EOF).  mate_short is
// set to 1 when the second file ran out first (caller prints bwa's
// warning).
int64_t bm_fq_chunk(void* vh, int64_t chunk_bp, const char*** names,
                    const char*** comments, const char*** seqs,
                    const char*** quals, int* mate_short) {
  Handle* h = static_cast<Handle*>(vh);
  h->records.clear();
  *mate_short = 0;
  int64_t size = 0;
  Record r1, r2;
  while (h->p1->next(&r1)) {
    if (h->p2) {
      if (!h->p2->next(&r2)) {
        *mate_short = 1;
        break;
      }
    }
    trim_readno(&r1.name);
    h->records.push_back(r1);
    size += static_cast<int64_t>(r1.seq.size());
    if (h->p2) {
      trim_readno(&r2.name);
      h->records.push_back(r2);
      size += static_cast<int64_t>(r2.seq.size());
    }
    if (size >= chunk_bp && h->records.size() % 2 == 0) break;
  }
  size_t n = h->records.size();
  h->names.resize(n);
  h->comments.resize(n);
  h->seqs.resize(n);
  h->quals.resize(n);
  for (size_t i = 0; i < n; ++i) {
    const Record& r = h->records[i];
    h->names[i] = r.name.c_str();
    h->comments[i] = r.has_comment ? r.comment.c_str() : nullptr;
    h->seqs[i] = r.seq.c_str();
    h->quals[i] = r.has_qual ? r.qual.c_str() : nullptr;
  }
  *names = h->names.data();
  *comments = h->comments.data();
  *seqs = h->seqs.data();
  *quals = h->quals.data();
  return static_cast<int64_t>(n);
}

void bm_fq_close(void* vh) {
  Handle* h = static_cast<Handle*>(vh);
  delete h->p1;
  delete h->p2;
  delete h;
}

}  // extern "C"
