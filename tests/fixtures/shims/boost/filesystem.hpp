#pragma once
// Shim: boost::filesystem -> std::filesystem for the reference-caller
// differential build (tests/test_reference_scoring.py).
#include <filesystem>
#include <fstream>

namespace boost { namespace filesystem {
using path = std::filesystem::path;
using ifstream = std::ifstream;
using ofstream = std::ofstream;
using std::filesystem::exists;
using std::filesystem::is_directory;
using std::filesystem::is_empty;
using std::filesystem::is_regular_file;
}}
