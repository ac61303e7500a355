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

namespace {

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
// through the dictionary DAG.
int seg_cut(const char* text, char* out, int cap) {
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

  // emit segments
  int pos = 0;
  while (pos < n) {
    int end = choice[pos];
    int b0 = cps[pos].first;
    int b1 = cps[end].first + cps[end].second;
    int seg_len = b1 - b0;
    if (*wp + seg_len + 2 > cap) return -1;
    if (*countp > 0) out[(*wp)++] = '\x01';
    memcpy(out + *wp, text + b0, seg_len);
    *wp += seg_len;
    ++(*countp);
    pos = end + 1;
  }
  return 0;
}

}  // extern "C"
