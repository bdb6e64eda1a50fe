// Test-only cross-validation driver, compiled at test time against the
// READ-ONLY reference sources (-I <reference>/src + fasta_parser.cc).
// Produces ground-truth output from the REAL reference components that
// need no external libraries (FastaParser char DFA and for_each_kmer<8>),
// so the framework's specs are validated against the actual reference
// code rather than against a same-author transcription.  No reference
// code is copied into this repository; tests skip if the reference tree
// or toolchain is absent.
//
// Modes:
//   ref_driver fasta <file>   parse; length-framed records to stdout
//   ref_driver kmers          stdin = one raw sequence string (no \n);
//                             prints "<offset>\t<kmer>" per window

#include "fasta_parser.h"
#include "kmer_data.h"

#include <cstdio>
#include <fstream>
#include <iostream>
#include <iterator>
#include <string>

static void put_field(const std::string &s) {
    std::printf("%zu\n", s.size());
    std::fwrite(s.data(), 1, s.size(), stdout);
    std::putchar('\n');
}

int main(int argc, char **argv) {
    if (argc < 2) return 2;
    std::string mode = argv[1];
    if (mode == "fasta") {
        if (argc < 3) return 2;
        FastaParser p;
        p.set_def_callback([](const std::string &id, const std::string &def,
                              const std::string &seq) {
            std::printf("REC\n");
            put_field(id);
            put_field(def);
            put_field(seq);
        });
        // no error callback: the reference prints to stderr and continues
        std::ifstream in(argv[2], std::ios::binary);
        if (!in) return 3;
        p.parse(in);
        return 0;
    }
    if (mode == "kmers") {
        std::string s((std::istreambuf_iterator<char>(std::cin)),
                      std::istreambuf_iterator<char>());
        for_each_kmer<8>(s, [](const std::array<char, 8> &k, size_t off) {
            std::printf("%zu\t%.8s\n", off, k.data());
        });
        return 0;
    }
    return 2;
}
