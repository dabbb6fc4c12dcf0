// ASAN/UBSAN harness for the native parsers (build: `make -C native asan`).
//
// Exercises every parse + fill + free path over the files given on argv —
// including the caller-allocated-buffer fills, which ctypes normally sizes
// from the accessor functions — so AddressSanitizer can catch any
// out-of-bounds write the Python tests cannot see.  Run by
// tests/unit/test_native_asan.py over synthetic and adversarial inputs.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
void* feats_parse(const char* path);
int64_t feats_num_examples(void*);
int64_t feats_num_entries(void*);
int64_t feats_id_buffer_size(void*);
int64_t feats_num_skipped(void*);
int32_t feats_needs_python(void*);
void feats_fill(void*, double*, int32_t*, int32_t*, float*, char*, int64_t*);
void feats_free(void*);
void* feats_parse_labels(const char* path);
int64_t featsl_num(void*);
int64_t featsl_id_buffer_size(void*);
int64_t featsl_num_skipped(void*);
int32_t featsl_needs_python(void*);
void featsl_fill(void*, double*, char*, int64_t*);
void featsl_free(void*);
void* featsl_parse_ids(void*, int32_t kind);
int64_t idt_bad_row(void*);
int64_t idt_num_docs(void*);
int64_t idt_docs_size(void*);
int64_t idt_num_padded(void*);
int64_t idt_padded_ids_size(void*);
void idt_fill(void*, int32_t*, int32_t*, int64_t*, char*, char*);
void idt_free(void*);
void* mentions_parse(const char* path);
int64_t men_num(void*);
int32_t men_fallback(void*);
int64_t men_num_docs(void*);
int64_t men_docs_size(void*);
void men_fill(void*, int32_t*, int32_t*, int32_t*, int32_t*, int32_t*,
              char*);
void men_free(void*);
int scores_write(const char* path, const char* const* ids,
                 const double* probs, int64_t n, int32_t c);
void* w2v_load(const char* path, const char* filter_words);
int64_t w2v_vocab(void*);
int32_t w2v_dim(void*);
int64_t w2v_words_size(void*);
void w2v_fill(void*, float*, char*, int64_t*);
void w2v_free(void*);
void* captions_parse(const char* path, const char* vocab);
void* captions_words(const char* path);
int64_t cap_num(void*);
int32_t cap_fallback(void*);
int64_t cap_num_docs(void*);
int64_t cap_docs_size(void*);
int64_t cap_ids_total(void*);
int64_t cap_num_flagged(void*);
int64_t cap_flagged_bytes(void*);
void cap_fill(void*, int32_t*, int32_t*, int64_t*, int32_t*, char*,
              int64_t*, char*);
void cap_free(void*);
}

namespace {

template <typename T>
T* buf(int64_t n) {
  static std::vector<std::vector<char>> keep;
  keep.emplace_back((size_t)(n > 0 ? n : 1) * sizeof(T));
  return (T*)keep.back().data();
}

void drive_feats(const char* path) {
  if (void* h = feats_parse(path)) {
    int64_t n = feats_num_examples(h), nnz = feats_num_entries(h);
    int64_t idl = feats_id_buffer_size(h);
    feats_num_skipped(h);
    feats_needs_python(h);
    feats_fill(h, buf<double>(n), buf<int32_t>(n + 1), buf<int32_t>(nnz),
               buf<float>(nnz), buf<char>(idl), buf<int64_t>(n));
    feats_free(h);
  }
  if (void* h = feats_parse_labels(path)) {
    int64_t n = featsl_num(h), idl = featsl_id_buffer_size(h);
    featsl_num_skipped(h);
    featsl_needs_python(h);
    featsl_fill(h, buf<double>(n), buf<char>(idl), buf<int64_t>(n));
    for (int kind = 0; kind < 3; ++kind) {
      void* t = featsl_parse_ids(h, kind);
      idt_bad_row(t);
      int64_t nd = idt_num_docs(t), ds = idt_docs_size(t);
      int64_t np = idt_num_padded(t), ps = idt_padded_ids_size(t);
      (void)nd;
      idt_fill(t, buf<int32_t>(n * 4), buf<int32_t>(n), buf<int64_t>(np),
               buf<char>(ps), buf<char>(ds));
      idt_free(t);
    }
    featsl_free(h);
  }
}

void drive_mentions(const char* path) {
  if (void* h = mentions_parse(path)) {
    int64_t n = men_num(h), ds = men_docs_size(h);
    men_fallback(h);
    men_num_docs(h);
    men_fill(h, buf<int32_t>(n), buf<int32_t>(n), buf<int32_t>(n),
             buf<int32_t>(n), buf<int32_t>(n), buf<char>(ds));
    men_free(h);
  }
}

void drive_captions(const char* path, const char* vocab) {
  if (void* h = captions_parse(path, vocab)) {
    int64_t n = cap_num(h), ds = cap_docs_size(h);
    int64_t tot = cap_ids_total(h), nf = cap_num_flagged(h);
    int64_t fb = cap_flagged_bytes(h);
    cap_fallback(h);
    cap_num_docs(h);
    cap_fill(h, buf<int32_t>(n), buf<int32_t>(n), buf<int64_t>(n + 1),
             buf<int32_t>(tot), buf<char>(ds), buf<int64_t>(nf),
             buf<char>(fb));
    cap_free(h);
  }
  if (void* h = captions_words(path)) {
    int64_t ds = cap_docs_size(h), nf = cap_num_flagged(h);
    int64_t fb = cap_flagged_bytes(h);
    cap_fill(h, buf<int32_t>(1), buf<int32_t>(1), buf<int64_t>(1),
             buf<int32_t>(1), buf<char>(ds), buf<int64_t>(nf),
             buf<char>(fb));
    cap_free(h);
  }
}

void drive_w2v(const char* path) {
  for (const char* filter : {(const char*)nullptr, "", "the\ndog\n"}) {
    if (void* h = w2v_load(path, filter)) {
      int64_t v = w2v_vocab(h);
      int32_t dim = w2v_dim(h);
      int64_t ws = w2v_words_size(h);
      w2v_fill(h, buf<float>(v * dim), buf<char>(ws), buf<int64_t>(v));
      w2v_free(h);
    }
  }
}

void drive_scores(const char* dir) {
  std::string out = std::string(dir) + "/asan.scores";
  const char* ids[3] = {"doc:a;m:0", "", "doc:\xc3\xbc;m:1"};
  double probs[6] = {0.25, 0.75, 1.0, 0.0, -1.5, 2.5};
  scores_write(out.c_str(), ids, probs, 3, 2);
  scores_write(out.c_str(), ids, probs, 0, 2);
  scores_write("/nonexistent-dir-xyz/f.scores", ids, probs, 1, 2);
}

}  // namespace

int main(int argc, char** argv) {
  // every input drives every parser family — wrong-grammar files exercise
  // the fallback/error paths, which is the point
  const char* vocab = "the\ndog\nDog\nstra\xc3\x9f""e\n";
  for (int i = 1; i < argc; ++i) {
    drive_feats(argv[i]);
    drive_mentions(argv[i]);
    drive_captions(argv[i], vocab);
    drive_w2v(argv[i]);   // adversarial bytes exercise the .bin header path
  }
  if (argc > 1) {
    std::string dir(argv[1]);
    size_t slash = dir.rfind('/');
    drive_scores(slash == std::string::npos ? "."
                                            : dir.substr(0, slash).c_str());
  }
  puts("asan-harness: OK");
  return 0;
}
