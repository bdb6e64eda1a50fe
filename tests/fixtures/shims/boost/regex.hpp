#pragma once
// Shim: boost::regex -> std::regex.  The reference's fusion pattern
// "^W?A[A|W]*W[B|W]*BW?" (call_functions.tcc:528) uses only constructs
// with identical ECMAScript semantics.  Unqualified regex_match calls in
// the reference resolve to std::regex_match via ADL on std::regex.
#include <regex>
#include <string>

namespace boost {

// boost (Perl/POSIX grammar) allows ']' as the first member of a
// character class ("[]...]" / "[^]...]"); ECMAScript instead parses
// "[^]" as "any character", silently changing the meaning of the
// reference's genome_regex "[^]]+" (function_map.h:122).  Rewrite that
// construct so std::regex matches boost's interpretation.
class regex : public std::regex {
public:
    regex() = default;
    regex(const char *pat) : std::regex(fix(pat)) {}
    regex(const std::string &pat) : std::regex(fix(pat)) {}

    static std::string fix(const std::string &p) {
        std::string out;
        for (std::size_t i = 0; i < p.size(); ++i) {
            if (p[i] == '\\' && i + 1 < p.size()) {  // skip escaped pairs
                out += p[i];
                out += p[i + 1];
                ++i;
                continue;
            }
            out += p[i];
            if (p[i] == '[') {
                std::size_t j = i + 1;
                if (j < p.size() && p[j] == '^') {
                    out += p[j];
                    ++j;
                }
                if (j < p.size() && p[j] == ']') {
                    out += "\\]";
                    ++j;
                }
                i = j - 1;
            }
        }
        return out;
    }
};

using smatch = std::smatch;
using cmatch = std::cmatch;
using sregex_iterator = std::sregex_iterator;
using sregex_token_iterator = std::sregex_token_iterator;
using std::regex_match;
using std::regex_search;
using std::regex_replace;
}
