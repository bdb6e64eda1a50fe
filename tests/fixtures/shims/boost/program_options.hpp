#pragma once
// Empty stub: matrix_distance.h includes program_options at top level but
// the MatrixDistance class itself never references it.
namespace boost { namespace program_options {}}
