// Chinese word segmenter: prefix-dictionary DAG + max-probability path.
//
// Native-code counterpart of the reference's `rjieba` dependency (a Rust
// extension used at src/f5_tts/model/utils.py:10,162). Implements the jieba
// algorithm family:
//   1. load a dictionary of (word, frequency) pairs (jieba dict.txt format:
//      "word freq [pos]") into a prefix map
//   2. build the DAG of all dictionary words starting at each position
//   3. dynamic programming (right to left) for the maximum log-probability
//      segmentation; out-of-vocabulary code points fall back to single-char
//      segments
//
// Exposed as a C ABI for ctypes (see segmenter.py). Thread-safe after init.

#include <array>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>
#include <cmath>
#include <cstdio>
#include <mutex>

namespace {

struct Dict {
  std::unordered_map<std::string, double> logfreq;  // word -> log(freq/total)
  // set of all prefixes of dictionary words (jieba's trie replacement):
  // prefix present with flag=false means "extendable but not a word".
  std::unordered_map<std::string, bool> prefixes;
  double total_log = 0.0;
  double min_logfreq = 0.0;
  bool loaded = false;
};

Dict g_dict;
std::mutex g_mutex;

// HMM (BMES) tables for OOV segmentation, jieba finalseg semantics.
struct Hmm {
  // state order: B=0, M=1, E=2, S=3
  double start[4];
  double trans[4][4];                              // log prob, MIN if illegal
  std::unordered_map<std::string, double> emit[4]; // codepoint -> log prob
  bool loaded = false;
};

constexpr double kMinProb = -3.14e100;
Hmm g_hmm;

int StateIdx(char c) {
  switch (c) {
    case 'B': return 0;
    case 'M': return 1;
    case 'E': return 2;
    case 'S': return 3;
  }
  return -1;
}

// Decode UTF-8 into per-codepoint byte spans.
std::vector<std::pair<int, int>> Codepoints(const char* s, int len) {
  std::vector<std::pair<int, int>> out;
  int i = 0;
  while (i < len) {
    unsigned char c = s[i];
    int n = 1;
    if ((c & 0x80) == 0x00) n = 1;
    else if ((c & 0xE0) == 0xC0) n = 2;
    else if ((c & 0xF0) == 0xE0) n = 3;
    else if ((c & 0xF8) == 0xF0) n = 4;
    if (i + n > len) n = 1;
    out.emplace_back(i, n);
    i += n;
  }
  return out;
}

}  // namespace

extern "C" {

// Load dict.txt ("word freq [pos]" lines). Returns word count, -1 on error.
int seg_load_dict(const char* path) {
  std::lock_guard<std::mutex> lock(g_mutex);
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  g_dict.logfreq.clear();
  g_dict.prefixes.clear();
  double total = 0.0;
  char line[4096];
  std::vector<std::pair<std::string, double>> entries;
  while (fgets(line, sizeof(line), f)) {
    char word[1024];
    double freq = 0.0;
    if (sscanf(line, "%1023s %lf", word, &freq) >= 2 && freq > 0) {
      entries.emplace_back(word, freq);
      total += freq;
    }
  }
  fclose(f);
  if (entries.empty() || total <= 0) return -1;
  g_dict.total_log = std::log(total);
  g_dict.min_logfreq = 0.0;
  for (auto& [word, freq] : entries) {
    double lf = std::log(freq) - g_dict.total_log;
    g_dict.logfreq[word] = lf;
    if (lf < g_dict.min_logfreq) g_dict.min_logfreq = lf;
    // register all codepoint-prefixes
    auto cps = Codepoints(word.c_str(), (int)word.size());
    for (size_t k = 1; k < cps.size(); ++k) {
      std::string pref = word.substr(0, cps[k].first);
      g_dict.prefixes.emplace(pref, false);
    }
    g_dict.prefixes[word] = true;
  }
  g_dict.loaded = true;
  return (int)entries.size();
}

// Load HMM tables from a TSV ("S <state> <logp>" / "T <from> <to> <logp>" /
// "E <state> <utf8-char> <logp>"). Returns emission count, -1 on error.
int seg_load_hmm(const char* path) {
  std::lock_guard<std::mutex> lock(g_mutex);
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  for (int i = 0; i < 4; ++i) {
    g_hmm.start[i] = kMinProb;
    g_hmm.emit[i].clear();
    for (int j = 0; j < 4; ++j) g_hmm.trans[i][j] = kMinProb;
  }
  char line[512];
  int count = 0;
  while (fgets(line, sizeof(line), f)) {
    char a, b;
    double p;
    char token[64];
    if (line[0] == 'T' && sscanf(line, "T %c %c %lf", &a, &b, &p) == 3) {
      int i = StateIdx(a), j = StateIdx(b);
      if (i >= 0 && j >= 0) g_hmm.trans[i][j] = p;
    } else if (line[0] == 'S' && sscanf(line, "S %c %lf", &a, &p) == 2) {
      int i = StateIdx(a);
      if (i >= 0) g_hmm.start[i] = p;
    } else if (line[0] == 'E' && sscanf(line, "E %c %63s %lf", &a, token, &p) == 3) {
      int i = StateIdx(a);
      if (i >= 0) {
        g_hmm.emit[i][token] = p;
        ++count;
      }
    }
  }
  fclose(f);
  g_hmm.loaded = count > 0;
  return count;
}

}  // extern "C"

namespace {

// Viterbi over BMES for an OOV codepoint run; emits segments via `emit_span`.
// Legal transitions: B<-(E,S), M<-(B,M), E<-(B,M), S<-(E,S); final in {E,S}.
template <typename EmitFn>
bool ViterbiCut(const char* text, const std::vector<std::pair<int, int>>& cps,
                EmitFn emit_span) {
  int n = (int)cps.size();
  std::vector<std::array<double, 4>> v(n);
  std::vector<std::array<int, 4>> back(n);
  auto emitp = [&](int s, int i) {
    std::string ch(text + cps[i].first, cps[i].second);
    auto it = g_hmm.emit[s].find(ch);
    return it != g_hmm.emit[s].end() ? it->second : kMinProb;
  };
  for (int s = 0; s < 4; ++s) {
    v[0][s] = g_hmm.start[s] + emitp(s, 0);
    back[0][s] = -1;
  }
  for (int i = 1; i < n; ++i) {
    for (int s = 0; s < 4; ++s) {
      double best = -1e308;
      int bj = 0;
      for (int j = 0; j < 4; ++j) {
        double cand = v[i - 1][j] + g_hmm.trans[j][s];
        if (cand > best) { best = cand; bj = j; }
      }
      v[i][s] = best + emitp(s, i);
      back[i][s] = bj;
    }
  }
  int s = (v[n - 1][2] >= v[n - 1][3]) ? 2 : 3;  // end in E or S
  std::vector<int> states(n);
  for (int i = n - 1; i >= 0; --i) {
    states[i] = s;
    s = back[i][s];
  }
  int start = 0;
  for (int i = 0; i < n; ++i) {
    if (states[i] == 2 || states[i] == 3) {  // E or S closes a word
      if (!emit_span(cps[start].first,
                     cps[i].first + cps[i].second)) return false;
      start = i + 1;
    }
  }
  if (start < n) {
    if (!emit_span(cps[start].first,
                   cps[n - 1].first + cps[n - 1].second)) return false;
  }
  return true;
}

// jieba keeps runs of latin letters / digits / joiners as one token
inline bool IsAlnumRun(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
         (c >= '0' && c <= '9') || c == '_' || c == '+' || c == '#' ||
         c == '.' || c == '%' || c == '-' || c == '\'';
}

}  // namespace

// DAG segmentation of one block (no ascii-run handling); appends segments.
static int CutBlock(const char* text, const std::vector<std::pair<int, int>>& cps,
                    char* out, int cap, int* w, int* count);

// Segment utf-8 `text`; writes '\x01'-separated segments into out (cap bytes).
// Returns number of segments, or -1 on error/overflow. Ascii-alnum runs are
// kept as single tokens (jieba block-splitting behavior); other text goes
// through the dictionary DAG (+ BMES viterbi for OOV runs when loaded).
extern "C" int seg_cut(const char* text, char* out, int cap) {
  if (!g_dict.loaded) return -1;
  int len = (int)strlen(text);
  auto all = Codepoints(text, len);
  int n = (int)all.size();
  int w = 0, count = 0;
  if (n == 0) { if (cap > 0) out[0] = 0; return 0; }

  auto emit = [&](int b0, int b1) -> bool {
    int seg_len = b1 - b0;
    if (w + seg_len + 2 > cap) return false;
    if (count > 0) out[w++] = '\x01';
    memcpy(out + w, text + b0, seg_len);
    w += seg_len;
    ++count;
    return true;
  };

  int i = 0;
  while (i < n) {
    unsigned char c0 = text[all[i].first];
    if (all[i].second == 1 && IsAlnumRun(c0)) {
      int j = i;
      while (j < n && all[j].second == 1 && IsAlnumRun((unsigned char)text[all[j].first])) ++j;
      if (!emit(all[i].first, all[j - 1].first + all[j - 1].second)) return -1;
      i = j;
    } else if (all[i].second == 1) {
      // other single-byte char (space, punctuation): one token
      if (!emit(all[i].first, all[i].first + all[i].second)) return -1;
      ++i;
    } else {
      // multi-byte block: run the dictionary DAG over the contiguous run
      int j = i;
      while (j < n && all[j].second > 1) ++j;
      std::vector<std::pair<int, int>> cps(all.begin() + i, all.begin() + j);
      if (CutBlock(text, cps, out, cap, &w, &count) < 0) return -1;
      i = j;
    }
  }
  if (w + 1 > cap) return -1;
  out[w] = 0;
  return count;
}

static int CutBlock(const char* text, const std::vector<std::pair<int, int>>& cps,
                    char* out, int cap, int* wp, int* countp) {
  int n = (int)cps.size();
  if (n == 0) return 0;

  // DAG: for each start cp index, list of end cp indices (inclusive)
  std::vector<std::vector<int>> dag(n);
  for (int i = 0; i < n; ++i) {
    dag[i].push_back(i);  // single char always possible
    std::string frag;
    for (int j = i; j < n; ++j) {
      frag.append(text + cps[j].first, cps[j].second);
      auto it = g_dict.prefixes.find(frag);
      if (it == g_dict.prefixes.end()) break;
      if (it->second && j > i) dag[i].push_back(j);
    }
  }

  // route[i] = (best score from i to end, chosen end index)
  const double oov_penalty = g_dict.min_logfreq - 1.0;
  std::vector<double> score(n + 1, 0.0);
  std::vector<int> choice(n, 0);
  for (int i = n - 1; i >= 0; --i) {
    double best = -1e100;
    int best_j = i;
    for (int j : dag[i]) {
      std::string frag(text + cps[i].first,
                       cps[j].first + cps[j].second - cps[i].first);
      auto it = g_dict.logfreq.find(frag);
      double lf = (it != g_dict.logfreq.end()) ? it->second : oov_penalty;
      double s = lf + score[j + 1];
      if (s > best) { best = s; best_j = j; }
    }
    score[i] = best;
    choice[i] = best_j;
  }

  // emit segments, with jieba __cut_DAG buffering: consecutive single-char
  // pieces that don't form a dictionary word go through the HMM (BMES
  // viterbi) for OOV word discovery
  auto emit_bytes = [&](int b0, int b1) -> bool {
    int seg_len = b1 - b0;
    if (*wp + seg_len + 2 > cap) return false;
    if (*countp > 0) out[(*wp)++] = '\x01';
    memcpy(out + *wp, text + b0, seg_len);
    *wp += seg_len;
    ++(*countp);
    return true;
  };

  std::vector<std::pair<int, int>> buf;  // buffered single-cp spans
  auto flush = [&]() -> bool {
    if (buf.empty()) return true;
    bool ok = true;
    if (buf.size() == 1) {
      ok = emit_bytes(buf[0].first, buf[0].first + buf[0].second);
    } else {
      std::string word(text + buf.front().first,
                       buf.back().first + buf.back().second - buf.front().first);
      if (g_dict.logfreq.count(word) || !g_hmm.loaded) {
        for (auto& cp : buf) {
          if (!(ok = emit_bytes(cp.first, cp.first + cp.second))) break;
        }
      } else {
        ok = ViterbiCut(text, buf, emit_bytes);
      }
    }
    buf.clear();
    return ok;
  };

  int pos = 0;
  while (pos < n) {
    int end = choice[pos];
    if (end == pos) {
      buf.push_back(cps[pos]);
    } else {
      if (!flush()) return -1;
      if (!emit_bytes(cps[pos].first, cps[end].first + cps[end].second)) return -1;
    }
    pos = end + 1;
  }
  if (!flush()) return -1;
  return 0;
}
