// fastcsv — native CSV row parser for the mcport data loader.
//
// The reference's ingestion tier is pandas (app.py:89-134); mcport keeps pandas
// for header sniffing / column selection (cheap, done once per file) and moves
// the hot per-row work — quoted-field splitting, thousands-separator stripping,
// MM/DD/YYYY | YYYY-MM-DD date parsing, float parsing — into this C++ unit.
// Exposed via a C ABI for ctypes (no pybind11 in this environment).
//
// Build: make -C mcport/_native     (g++ -O3 -shared -fPIC)
//
// Contract: mc_parse_csv(buf, n, date_col, price_col, skip_rows, strip_thousands,
//                        out_days, out_prices, max_rows)
//   - buf/n: whole file contents (UTF-8; a leading BOM is skipped)
//   - date_col/price_col: 0-based column indices chosen by the Python side
//   - skip_rows: number of physical lines to skip (header offset)
//   - strip_thousands: 1 → remove ',' inside quoted numeric fields
//   - out_days: days since 1970-01-01 (int64); out_prices: double
//   - rows whose date or price fail to parse are dropped (pandas
//     errors='coerce' + dropna semantics)
//   - returns number of rows written, or -1 on argument error.

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

// Howard Hinnant's days-from-civil algorithm (public domain).
int64_t days_from_civil(int y, unsigned m, unsigned d) {
  y -= m <= 2;
  const int era = (y >= 0 ? y : y - 399) / 400;
  const unsigned yoe = static_cast<unsigned>(y - era * 400);
  const unsigned doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
  const unsigned doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
  return static_cast<int64_t>(era) * 146097 + static_cast<int64_t>(doe) - 719468;
}

bool parse_uint(const char* s, int len, unsigned* out) {
  if (len <= 0) return false;
  unsigned v = 0;
  for (int i = 0; i < len; ++i) {
    if (s[i] < '0' || s[i] > '9') return false;
    v = v * 10 + static_cast<unsigned>(s[i] - '0');
  }
  *out = v;
  return true;
}

// MM/DD/YYYY or M/D/YYYY or YYYY-MM-DD → days since epoch; false on failure.
bool parse_date(const char* s, int len, int64_t* out) {
  int sep1 = -1, sep2 = -1;
  char sep = 0;
  for (int i = 0; i < len; ++i) {
    if (s[i] == '/' || s[i] == '-') {
      if (sep1 < 0) { sep1 = i; sep = s[i]; }
      else if (sep2 < 0 && s[i] == sep) { sep2 = i; }
      else if (sep2 >= 0) return false;
    }
  }
  if (sep1 < 0 || sep2 < 0) return false;
  unsigned a, b, c;
  if (!parse_uint(s, sep1, &a)) return false;
  if (!parse_uint(s + sep1 + 1, sep2 - sep1 - 1, &b)) return false;
  if (!parse_uint(s + sep2 + 1, len - sep2 - 1, &c)) return false;
  unsigned y, m, d;
  if (sep == '-' && a >= 1000) { y = a; m = b; d = c; }        // YYYY-MM-DD
  else if (c >= 1000) { m = a; d = b; y = c; }                 // MM/DD/YYYY
  else return false;
  if (m < 1 || m > 12 || d < 1 || d > 31) return false;
  *out = days_from_civil(static_cast<int>(y), m, d);
  return true;
}

// float with optional thousands separators already removed by the caller slice
bool parse_price(const char* s, int len, bool strip_thousands, double* out) {
  char tmp[64];
  int j = 0;
  for (int i = 0; i < len && j < 63; ++i) {
    char ch = s[i];
    if (ch == ',' ) {
      if (strip_thousands) continue;
      return false;
    }
    if (ch == ' ') continue;
    tmp[j++] = ch;
  }
  if (j == 0) return false;
  tmp[j] = '\0';
  char* end = nullptr;
  double v = strtod(tmp, &end);
  if (end != tmp + j) return false;
  *out = v;
  return true;
}

}  // namespace

extern "C" {

long mc_parse_csv(const char* buf, long n, int date_col, int price_col,
                  int skip_rows, int strip_thousands,
                  int64_t* out_days, double* out_prices, long max_rows) {
  if (!buf || n <= 0 || date_col < 0 || price_col < 0 || !out_days || !out_prices)
    return -1;
  long pos = 0;
  // skip UTF-8 BOM
  if (n >= 3 && static_cast<unsigned char>(buf[0]) == 0xEF &&
      static_cast<unsigned char>(buf[1]) == 0xBB &&
      static_cast<unsigned char>(buf[2]) == 0xBF)
    pos = 3;

  long written = 0;
  int line_idx = 0;
  const int want_max = date_col > price_col ? date_col : price_col;

  while (pos < n && written < max_rows) {
    // one physical line
    long line_start = pos;
    long line_end = pos;
    bool in_quotes = false;
    while (line_end < n) {
      char ch = buf[line_end];
      if (ch == '"') in_quotes = !in_quotes;
      else if (ch == '\n' && !in_quotes) break;
      ++line_end;
    }
    pos = line_end < n ? line_end + 1 : n;
    if (line_idx++ < skip_rows) continue;

    long le = line_end;
    if (le > line_start && buf[le - 1] == '\r') --le;
    if (le == line_start) continue;  // blank line

    // split into fields (quoted CSV), capturing the two wanted columns
    const char* field_ptr[2] = {nullptr, nullptr};
    int field_len[2] = {0, 0};
    int col = 0;
    long i = line_start;
    while (i <= le && col <= want_max) {
      bool quoted = i < le && buf[i] == '"';
      long fstart = quoted ? i + 1 : i;
      long j = fstart;
      if (quoted) {
        while (j < le && buf[j] != '"') ++j;
      } else {
        while (j < le && buf[j] != ',') ++j;
      }
      long fend = j;
      // advance past closing quote and the comma
      if (quoted && j < le) ++j;
      while (j < le && buf[j] != ',') ++j;
      if (col == date_col) { field_ptr[0] = buf + fstart; field_len[0] = static_cast<int>(fend - fstart); }
      if (col == price_col) { field_ptr[1] = buf + fstart; field_len[1] = static_cast<int>(fend - fstart); }
      ++col;
      i = j + 1;
    }
    if (!field_ptr[0] || !field_ptr[1]) continue;

    int64_t days;
    double price;
    if (!parse_date(field_ptr[0], field_len[0], &days)) continue;
    if (!parse_price(field_ptr[1], field_len[1], strip_thousands != 0, &price)) continue;
    out_days[written] = days;
    out_prices[written] = price;
    ++written;
  }
  return written;
}

}  // extern "C"
