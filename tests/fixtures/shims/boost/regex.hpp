#pragma once
// Shim: boost::regex -> std::regex.  The reference's fusion pattern
// "^W?A[A|W]*W[B|W]*BW?" (call_functions.tcc:528) uses only constructs
// with identical ECMAScript semantics.  Unqualified regex_match calls in
// the reference resolve to std::regex_match via ADL on std::regex.
#include <regex>

namespace boost {
using regex = std::regex;
using smatch = std::smatch;
using cmatch = std::cmatch;
using std::regex_match;
using std::regex_search;
using std::regex_replace;
}
