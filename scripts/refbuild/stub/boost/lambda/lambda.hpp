#ifndef STUB_BOOST_LAMBDA_LAMBDA
#define STUB_BOOST_LAMBDA_LAMBDA 1
#include <boost/lambda/bind.hpp>
#endif
