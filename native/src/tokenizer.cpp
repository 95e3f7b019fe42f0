// CLIP byte-level BPE tokenizer.
//
// The reference's tokenization lived in external native code (HF tokenizers
// via transformers); this framework's serving path ships its own. Given the
// checkpoint's vocab.json + merges.txt, encodes prompts exactly like the CLIP
// tokenizer: whitespace cleanup + lowercase, GPT-2-style byte-to-unicode
// mapping, per-word BPE with the "</w>" end-of-word marker, bos/eos framing
// and fixed-length padding.
//
// Unicode note: the pre-tokenizer approximates \p{L}/\p{N} as [ASCII letters,
// any non-ASCII byte sequence] / [0-9]; identical to the reference regex for
// ASCII prompts, and benign for others (BPE still sees the same bytes).
//
// C ABI (ctypes). Thread-safe after creation (encode is const).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---- utf8 helpers ----------------------------------------------------------

void append_codepoint(std::string& s, uint32_t cp) {
  if (cp < 0x80) {
    s.push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    s.push_back(static_cast<char>(0xC0 | (cp >> 6)));
    s.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    s.push_back(static_cast<char>(0xE0 | (cp >> 12)));
    s.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    s.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    s.push_back(static_cast<char>(0xF0 | (cp >> 18)));
    s.push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    s.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    s.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

// GPT-2/CLIP bytes_to_unicode: visible latin-1 bytes map to themselves,
// the rest to 256, 257, ... in order.
std::vector<std::string> make_byte_encoder() {
  std::vector<std::string> enc(256);
  std::vector<bool> direct(256, false);
  auto mark = [&](int lo, int hi) {
    for (int b = lo; b <= hi; ++b) direct[b] = true;
  };
  mark('!', '~');
  mark(0xA1, 0xAC);
  mark(0xAE, 0xFF);
  uint32_t next = 256;
  for (int b = 0; b < 256; ++b) {
    std::string s;
    append_codepoint(s, direct[b] ? static_cast<uint32_t>(b) : next++);
    enc[b] = s;
  }
  return enc;
}

// ---- minimal JSON (flat {"string": int, ...}) ------------------------------

struct JsonCursor {
  const char* p;
  const char* end;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\n' || *p == '\t' || *p == '\r')) ++p;
  }

  bool parse_string(std::string& out) {
    skip_ws();
    if (p >= end || *p != '"') return false;
    ++p;
    out.clear();
    while (p < end && *p != '"') {
      if (*p == '\\') {
        ++p;
        if (p >= end) return false;
        switch (*p) {
          case 'n': out.push_back('\n'); break;
          case 't': out.push_back('\t'); break;
          case 'r': out.push_back('\r'); break;
          case 'b': out.push_back('\b'); break;
          case 'f': out.push_back('\f'); break;
          case '"': out.push_back('"'); break;
          case '\\': out.push_back('\\'); break;
          case '/': out.push_back('/'); break;
          case 'u': {
            if (end - p < 5) return false;
            uint32_t cp = 0;
            for (int i = 1; i <= 4; ++i) {
              char c = p[i];
              cp <<= 4;
              if (c >= '0' && c <= '9') cp |= c - '0';
              else if (c >= 'a' && c <= 'f') cp |= c - 'a' + 10;
              else if (c >= 'A' && c <= 'F') cp |= c - 'A' + 10;
              else return false;
            }
            p += 4;
            // surrogate pair
            if (cp >= 0xD800 && cp <= 0xDBFF && end - p >= 7 && p[1] == '\\' &&
                p[2] == 'u') {
              uint32_t lo = 0;
              for (int i = 3; i <= 6; ++i) {
                char c = p[i];
                lo <<= 4;
                if (c >= '0' && c <= '9') lo |= c - '0';
                else if (c >= 'a' && c <= 'f') lo |= c - 'a' + 10;
                else if (c >= 'A' && c <= 'F') lo |= c - 'A' + 10;
              }
              if (lo >= 0xDC00 && lo <= 0xDFFF) {
                cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
                p += 6;
              }
            }
            append_codepoint(out, cp);
            break;
          }
          default: return false;
        }
        ++p;
      } else {
        out.push_back(*p++);
      }
    }
    if (p >= end) return false;
    ++p;  // closing quote
    return true;
  }

  bool parse_int(long& out) {
    skip_ws();
    char* q = nullptr;
    out = std::strtol(p, &q, 10);
    if (q == p) return false;
    p = q;
    return true;
  }
};

// ---- tokenizer -------------------------------------------------------------

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& pr) const {
    return std::hash<std::string>()(pr.first) * 1000003u ^
           std::hash<std::string>()(pr.second);
  }
};

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::pair<std::string, std::string>, int, PairHash> ranks;
  std::vector<std::string> byte_enc = make_byte_encoder();
  int32_t unk = 0;

  bool load_vocab(const char* path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) return false;
    std::stringstream ss;
    ss << f.rdbuf();
    std::string body = ss.str();
    JsonCursor c{body.data(), body.data() + body.size()};
    c.skip_ws();
    if (c.p >= c.end || *c.p != '{') return false;
    ++c.p;
    while (true) {
      c.skip_ws();
      if (c.p < c.end && *c.p == '}') break;
      std::string key;
      long val;
      if (!c.parse_string(key)) return false;
      c.skip_ws();
      if (c.p >= c.end || *c.p != ':') return false;
      ++c.p;
      if (!c.parse_int(val)) return false;
      vocab.emplace(std::move(key), static_cast<int32_t>(val));
      c.skip_ws();
      if (c.p < c.end && *c.p == ',') ++c.p;
    }
    auto it = vocab.find("<|endoftext|>");
    unk = it != vocab.end() ? it->second : 0;
    return true;
  }

  bool load_merges(const char* path) {
    std::ifstream f(path);
    if (!f) return false;
    std::string line;
    int rank = 0;
    while (std::getline(f, line)) {
      if (!line.empty() && line.back() == '\r') line.pop_back();
      if (line.empty() || line[0] == '#') continue;
      size_t sp = line.find(' ');
      if (sp == std::string::npos) continue;
      ranks.emplace(std::make_pair(line.substr(0, sp), line.substr(sp + 1)),
                    rank++);
    }
    return rank > 0;
  }

  // BPE over one pre-token (already byte-encoded symbols, "</w>" appended).
  void bpe(std::vector<std::string>& sym) const {
    while (sym.size() > 1) {
      int best = INT32_MAX;
      size_t best_i = 0;
      for (size_t i = 0; i + 1 < sym.size(); ++i) {
        auto it = ranks.find(std::make_pair(sym[i], sym[i + 1]));
        if (it != ranks.end() && it->second < best) {
          best = it->second;
          best_i = i;
        }
      }
      if (best == INT32_MAX) break;
      sym[best_i] += sym[best_i + 1];
      sym.erase(sym.begin() + best_i + 1);
    }
  }

  void encode_word(const std::string& word, std::vector<int32_t>& out) const {
    if (word.empty()) return;
    std::vector<std::string> sym;
    for (unsigned char b : word) sym.push_back(byte_enc[b]);
    sym.back() += "</w>";
    bpe(sym);
    for (auto& s : sym) {
      auto it = vocab.find(s);
      out.push_back(it != vocab.end() ? it->second : unk);
    }
  }

  // CLIP pre-tokenizer (ASCII approximation of the reference regex; see top).
  void encode(const char* text, std::vector<int32_t>& out) const {
    std::string t;
    // whitespace cleanup + lowercase
    bool in_ws = true;
    for (const char* p = text; *p; ++p) {
      unsigned char c = static_cast<unsigned char>(*p);
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\v') {
        if (!in_ws && t.size()) t.push_back(' ');
        in_ws = true;
      } else {
        t.push_back(static_cast<char>(c >= 'A' && c <= 'Z' ? c + 32 : c));
        in_ws = false;
      }
    }
    while (!t.empty() && t.back() == ' ') t.pop_back();

    auto is_letter = [](unsigned char c) {
      return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c >= 0x80;
    };
    auto is_digit = [](unsigned char c) { return c >= '0' && c <= '9'; };

    size_t i = 0;
    while (i < t.size()) {
      unsigned char c = static_cast<unsigned char>(t[i]);
      if (c == ' ') {
        ++i;
        continue;
      }
      // contractions: 's 't 're 've 'm 'll 'd
      if (c == '\'' && i + 1 < t.size()) {
        static const char* contr[] = {"'s", "'t", "'re", "'ve", "'m", "'ll", "'d"};
        bool matched = false;
        for (const char* cs : contr) {
          size_t len = std::strlen(cs);
          if (t.compare(i, len, cs) == 0) {
            encode_word(t.substr(i, len), out);
            i += len;
            matched = true;
            break;
          }
        }
        if (matched) continue;
      }
      size_t j = i;
      if (is_letter(c)) {
        while (j < t.size() && is_letter(static_cast<unsigned char>(t[j]))) ++j;
      } else if (is_digit(c)) {
        j = i + 1;  // each digit is its own token ([\p{N}])
      } else {
        while (j < t.size()) {
          unsigned char d = static_cast<unsigned char>(t[j]);
          if (d == ' ' || is_letter(d) || is_digit(d)) break;
          ++j;
        }
      }
      encode_word(t.substr(i, j - i), out);
      i = j;
    }
  }
};

}  // namespace

extern "C" {

void* st_tok_create(const char* vocab_json_path, const char* merges_path) {
  auto* tok = new Tokenizer();
  if (!tok->load_vocab(vocab_json_path) || !tok->load_merges(merges_path)) {
    delete tok;
    return nullptr;
  }
  return tok;
}

void st_tok_free(void* h) { delete static_cast<Tokenizer*>(h); }

// Encode with bos/eos framing, truncate to max_len, pad with pad_id.
// Returns number of real (non-pad) tokens, or -1 on error.
int32_t st_tok_encode(const void* h, const char* text, int32_t* out,
                      int32_t max_len, int32_t bos, int32_t eos, int32_t pad_id) {
  if (!h || !out || max_len < 2) return -1;
  const auto* tok = static_cast<const Tokenizer*>(h);
  std::vector<int32_t> ids;
  ids.push_back(bos);
  tok->encode(text, ids);
  if (static_cast<int32_t>(ids.size()) > max_len - 1)
    ids.resize(max_len - 1);
  ids.push_back(eos);
  int32_t n = static_cast<int32_t>(ids.size());
  for (int32_t i = 0; i < max_len; ++i) out[i] = i < n ? ids[i] : pad_id;
  return n;
}

int32_t st_tok_vocab_size(const void* h) {
  return static_cast<int32_t>(static_cast<const Tokenizer*>(h)->vocab.size());
}

}  // extern "C"
