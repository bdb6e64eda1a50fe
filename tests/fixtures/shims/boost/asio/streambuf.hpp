#pragma once
// Empty stub: included but unused by the shim-compiled reference headers.
namespace boost { namespace asio {}}
