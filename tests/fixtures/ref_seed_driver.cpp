// Differential driver for the reference's SEED function-string grammar
// (seed_utils.h, verbatim), compiled with the std::regex shim for
// boost::regex.  Reads one function string per stdin line; emits
// length-framed fields per line:
//   echo, strip_func, strip_func_comment, split_func_comment (func, sep,
//   comment), is_truncated_comment ("0"/"1"), n_roles, roles...
#include <cstdio>
#include <iostream>
#include <string>

#include "seed_utils.h"

static void emit(const std::string &s) {
    printf("%zu\n%s\n", s.size(), s.c_str());
}

int main() {
    std::string line;
    while (std::getline(std::cin, line)) {
        emit(line);
        emit(seed_utils::strip_func(line));
        emit(seed_utils::strip_func_comment(line));
        std::string f, sep, c;
        seed_utils::split_func_comment(line, f, sep, c);
        emit(f);
        emit(sep);
        emit(c);
        emit(seed_utils::is_truncated_comment(line) ? "1" : "0");
        auto roles = seed_utils::roles_of_function(line);
        emit(std::to_string(roles.size()));
        for (auto &r : roles)
            emit(r);
    }
    return 0;
}
